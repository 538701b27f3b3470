"""Minimal Analyze 7.5 (.hdr/.img) volume reader.

The reference loads LGE volumes through nibabel
(/root/reference/data/reconstruction/scar_seg/scar_segmentation.py:87-99);
nibabel is not in this image, and the Analyze 7.5 header is a simple fixed
348-byte struct, so we parse it directly.

Only the fields needed for reading data are used: dims, datatype, scale.
"""

import os
import struct

import numpy as np

# Analyze 7.5 datatype codes → numpy dtypes
_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    132: np.int16,  # DT_SIGNED_SHORT variants seen in the wild
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
}


def load_analyze(path):
  """Load an Analyze image given its .img or .hdr path → numpy array.

  Returns the volume with shape (dim1, dim2, ..., dimN) squeezed of
  singleton trailing dims, matching ``np.squeeze(nib.load(p).get_data())``.
  """
  base, ext = os.path.splitext(path)
  hdr_path = base + '.hdr'
  img_path = base + '.img'
  if not os.path.exists(hdr_path):
    raise FileNotFoundError(hdr_path)

  with open(hdr_path, 'rb') as f:
    header = f.read(348)

  # sizeof_hdr tells us the byte order (must equal 348)
  sizeof_hdr = struct.unpack('<i', header[0:4])[0]
  endian = '<' if sizeof_hdr == 348 else '>'

  # dim[8] lives at offset 40 in the image_dimension struct
  dims = struct.unpack(endian + '8h', header[40:56])
  ndim = dims[0]
  shape = tuple(dims[1:1 + ndim])

  datatype = struct.unpack(endian + 'h', header[70:72])[0]
  if datatype not in _DTYPES:
    raise ValueError('Unsupported Analyze datatype {}'.format(datatype))
  dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)

  # SPM-style scale factor at offset 112 (funused1); 0 means unscaled
  scale = struct.unpack(endian + 'f', header[112:116])[0]

  with open(img_path, 'rb') as f:
    data = np.frombuffer(f.read(), dtype=dtype)

  count = int(np.prod(shape))
  data = data[:count].reshape(shape, order='F')
  if scale not in (0.0, 1.0) and np.isfinite(scale):
    data = data * scale
  return np.squeeze(np.asarray(data))
