"""TPU-native compressed-sensing MRI ops.

Numerics core replacing the reference's deep_med_lib
(/root/reference/data/reconstruction/deep_med_lib/): FFT helpers, complex
packing, undersampling-mask generators (host numpy + on-device keyed JAX),
the k-space forward model, and the data-consistency operator used inside the
RecNet cascade.
"""

from csmri_refinement_tpu.ops.fft import (  # noqa: F401
    pack_complex, unpack_complex, fft2, ifft2, fft2c, ifft2c, complex_abs)
from csmri_refinement_tpu.ops.dc import data_consistency  # noqa: F401
from csmri_refinement_tpu.ops.undersample import (  # noqa: F401
    undersample, undersample_batch)
