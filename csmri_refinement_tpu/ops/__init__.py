"""TPU-native compressed-sensing MRI ops.

Numerics core replacing the reference's deep_med_lib
(/root/reference/data/reconstruction/deep_med_lib/): FFT helpers, complex
packing, undersampling-mask generators (host numpy + on-device keyed JAX),
the k-space forward model, and the data-consistency operator used inside the
RecNet cascade.
"""

from csmri_refinement_tpu.ops.fft import (  # noqa: F401
    pack_complex, unpack_complex, fft2c, ifft2c, complex_abs)
from csmri_refinement_tpu.ops.dc import data_consistency  # noqa: F401
# NOTE: the `undersample`/`fft2`/`ifft2` *functions* are not re-exported at
# package level — doing so would shadow the `ops.undersample`/`ops.fft`
# submodule attributes. Import them from their modules directly.
from csmri_refinement_tpu.ops.undersample import undersample_batch  # noqa: F401
