"""Undersampling-mask generators: host numpy (reference-faithful) and
on-device keyed JAX.

The numpy implementations reproduce the reference's sampling math exactly
(/root/reference/data/reconstruction/deep_med_lib/utils/compressed_sensing.py):

* ``cartesian_mask`` — variable-density line sampling with guaranteed center
  lines, kt-FOCUSS-derived pdf (compressed_sensing.py:82-123)
* ``radial_sampling`` — golden-angle spokes gridded to cartesian
  (compressed_sensing.py:568-647)
* ``get_mask_generator`` — config dispatch incl. variable acceleration
  (myImageTransformations.py:22-84; central_lines=8 for cartesian)

The JAX implementations are stateless and jittable. Choice-without-
replacement over a pdf (numpy's sequential draw = Plackett–Luce process) is
sampled with the distributionally-equivalent Gumbel top-k trick, which keeps
shapes static even when the number of lines is a traced value (variable
acceleration). Masks are deterministic per PRNG key, which fixes by
construction the reference's stateful fixed-validation-mask race
(myImageTransformations.py:1204-1206).
"""

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host (numpy) reference-faithful generators
# ---------------------------------------------------------------------------

def normal_pdf(length, sensitivity):
  """Unnormalized gaussian pdf over line indices (compressed_sensing.py:13-14)."""
  return np.exp(-sensitivity * (np.arange(length) - length / 2) ** 2)


def cartesian_mask_np(shape, acc, sample_n=10, centred=False, rng=None):
  """Variable-density cartesian line mask.

  shape: (..., nx, ny); acc: acceleration factor (float ok).
  Sampling density estimated from the kt-FOCUSS implementation
  (compressed_sensing.py:82-123).
  """
  if rng is None:
    rng = np.random
  N, Nx, Ny = int(np.prod(shape[:-2])), shape[-2], shape[-1]
  pdf_x = normal_pdf(Nx, 0.5 / (Nx / 10.) ** 2)
  lmda = Nx / (2. * acc)
  n_lines = int(Nx // acc)

  # Add uniform distribution
  pdf_x += lmda * 1. / Nx

  if sample_n:
    pdf_x[Nx // 2 - sample_n // 2:Nx // 2 + sample_n // 2] = 0
    pdf_x /= np.sum(pdf_x)
    n_lines -= sample_n

  mask = np.zeros((N, Nx))
  for i in range(N):
    idx = rng.choice(Nx, n_lines, False, pdf_x)
    mask[i, idx] = 1

  if sample_n:
    mask[:, Nx // 2 - sample_n // 2:Nx // 2 + sample_n // 2] = 1

  mask = np.repeat(mask[:, :, None], Ny, axis=2)
  mask = mask.reshape(shape)

  if not centred:
    mask = np.fft.ifftshift(mask, axes=(-2, -1))
  return mask


def radial_sampling_np(shape, n_lines, angle_begin=0, rand=False,
                       golden_angle=False, centred=True, rng=None):
  """Golden-angle/uniform radial spokes gridded to cartesian
  (compressed_sensing.py:568-647). Requires nx == ny."""
  if rng is None:
    rng = np.random
  GOLDEN_ANGLE = np.pi / ((1 + np.sqrt(5)) / 2)

  n, nx0, ny0 = int(np.prod(shape[:-2])), shape[-2], shape[-1]
  nx = ny = max(nx0, ny0)
  assert nx == ny, 'radial sampling requires square k-space'

  mask = np.zeros((n, nx, ny), dtype=int)

  if rand:
    angle_begin = np.pi * rng.random_sample()

  y = np.arange(-nx / 2, nx / 2, 1)
  x = np.arange(-ny / 2, ny / 2, 1)

  if golden_angle:
    angles = np.array([angle_begin + i * GOLDEN_ANGLE
                       for i in range(n_lines * n)])
  else:
    angles = np.tile(np.arange(0, np.pi, np.pi / n_lines), n)
    angles = angles + np.repeat(rng.random_sample(n) * np.pi / n_lines,
                                n_lines)

  kloc_all = np.outer(y, np.cos(angles)) + 1j * np.outer(x, np.sin(angles))

  # Round to the nearest cartesian location, recentre, wrap out-of-range.
  kloc1 = np.round(kloc_all + (0.5 + 0.5j)) + ((nx / 2) + (ny / 2) * 1j)
  kloc1real = np.real(kloc1)
  kloc1real = kloc1real - nx * (kloc1real > nx)
  kloc1imag = np.imag(kloc1)
  kloc1imag = kloc1imag - ny * (kloc1imag > ny)
  kloc1real = kloc1real + nx * (kloc1real < 1)
  kloc1imag = kloc1imag + ny * (kloc1imag < 1)
  t = np.repeat(np.arange(n), n_lines * nx)
  xi = (kloc1real.transpose().reshape(-1) - 1).astype(int)
  yi = (kloc1imag.transpose().reshape(-1) - 1).astype(int)
  mask[t, xi, yi] = 1

  if nx0 != ny0:
    xpad = (nx - nx0) // 2
    ypad = (ny - ny0) // 2
    mask = mask[:, xpad:nx - xpad, ypad:ny - ypad]

  if not centred:
    mask = np.fft.ifftshift(mask, axes=(-2, -1))
  return mask.reshape(shape)


def var_dens_mask_2d(shape, ivar, sample_high_freq=True, rng=None,
                     sample_n=9):
  """Variable-density 2D Bernoulli mask from a separable gaussian pdf
  (reference compressed_sensing.py:52-79); fully-sampled center block."""
  if rng is None:
    rng = np.random
  if len(shape) == 3:
    nt, nx, ny = shape
  else:
    nx, ny = shape
    nt = 1
  pdf = np.outer(normal_pdf(nx, ivar), normal_pdf(ny, ivar))
  if sample_high_freq:
    pdf = pdf / 1.1 + 0.01
  mask = rng.binomial(1, np.broadcast_to(pdf, (nt, nx, ny)))
  xc, yc = nx // 2, ny // 2
  half = sample_n // 2
  mask[:, xc - half:xc + half + 1, yc - half:yc + half + 1] = 1
  if nt == 1 and len(shape) == 2:
    return mask.reshape(nx, ny)
  return mask


def nlines_mask(shape, n, centred=False, sample_centre=True, sample_n=1,
                rng=None):
  """Sample n k-space lines uniformly at random, optionally forcing the
  central lines (reference compressed_sensing.py:204-233)."""
  if rng is None:
    rng = np.random
  nt, nx, ny = shape
  mask = np.zeros(shape)
  center = set()
  if sample_centre:
    xc = nx // 2
    s = sample_n // 2
    center = set(range(xc - s, xc - s + sample_n))
    mask[:, xc - s:xc - s + sample_n, :] = 1
    n -= sample_n
  if n > 0:
    for t in range(nt):
      idx = rng.choice(nx, n, replace=False)
      while center and center.intersection(idx.tolist()):
        idx = rng.choice(nx, n, replace=False)
      mask[t, idx, :] = 1
  if not centred:
    mask = np.fft.ifftshift(mask, axes=(-2, -1))
  return mask


def lowres_mask(shape, n, centred=False, skip=True, rng=None):
  """Low-resolution acquisition: n central lines (or randomly-signed
  offsets from center with ``skip``), reference compressed_sensing.py:236-263."""
  if rng is None:
    rng = np.random
  nt, nx, ny = shape
  mask = np.zeros((nt, nx, 1))
  xc = nx // 2
  for t in range(nt):
    if skip:
      sign = ((rng.binomial(1, 0.5, n) - 0.5) * 2).astype(int)
      mask[t, xc + np.arange(n) * sign, :] = 1
    else:
      s = n // 2
      mask[t, xc - s:xc - s + n, :] = 1
  mask = np.repeat(mask, ny, axis=-1)
  if not centred:
    mask = np.fft.ifftshift(mask, axes=(-2, -1))
  return mask


def shear_grid_mask(shape, acceleration_rate, sample_low_freq=True,
                    centred=False, sample_n=10, rng=None, perturb=False):
  """Shear-grid (k-t) sampling: each frame samples every
  ``acceleration_rate``-th line with a per-frame shifted phase; optionally
  ±1-line perturbation (reference compressed_sensing.py:288-375)."""
  if rng is None:
    rng = np.random
  nt, nx, ny = shape
  start = rng.randint(0, acceleration_rate)
  mask = np.zeros((nt, nx))
  for t in range(nt):
    mask[t, (start + t) % acceleration_rate::acceleration_rate] = 1

  if perturb:
    shift = np.array([-1, 0, 1])[rng.randint(0, 3, size=nt * nx)]
    new_mask = np.zeros_like(mask)
    for t in range(nt):
      for x in range(nx):
        if mask[t, x]:
          new_mask[t, (x + shift[t * x]) % nx] = 1
    mask = new_mask

  xc = nx // 2
  xl = sample_n // 2
  if sample_low_freq and centred:
    xh = xl + (1 if sample_n % 2 == 0 else 0)
    mask[:, xc - xl:xc + xh + 1] = 1
  elif sample_low_freq:
    xh = xl - (1 if sample_n % 2 == 1 else 0)
    if xl > 0:
      mask[:, :xl] = 1
    if xh > 0:
      mask[:, -xh:] = 1

  return np.repeat(mask[..., np.newaxis], ny, axis=-1)


def undersampling_rate(mask):
  """Fraction of sampled k-space (reference compressed_sensing.py:564-565)."""
  return float(np.sum(mask)) / mask.size


def get_undersampling_sensitivity(dim, target_factor, num_trials=20,
                                  tol=1.0, rng=None, max_iters=40):
  """Search the gaussian-pdf sensitivity giving a target undersampling
  factor for :func:`var_dens_mask_2d`.

  Functional equivalent of the reference's stepwise calibration search
  (compressed_sensing.py:410-457): finds ``ivar`` such that the mean
  sampling rate of generated masks ≈ 1/target_factor, by bisection on a
  bracketing interval (monotone: higher sensitivity → narrower pdf → lower
  rate).
  """
  if rng is None:
    rng = np.random.RandomState(0)
  target_rate = 1.0 / target_factor

  def mean_rate(ivar):
    masks = var_dens_mask_2d((num_trials,) + tuple(dim), ivar, rng=rng)
    return masks.mean()

  lo, hi = 1e-8, 1e-2
  while mean_rate(hi) > target_rate and hi < 1e3:
    hi *= 10
  if mean_rate(lo) < target_rate:
    raise ValueError(
        'Cannot reach target rate {}: masks sample a fully-covered center '
        'block; ensure (central samples)/mask.size < 1/factor'.format(
            target_rate))
  for _ in range(max_iters):
    mid = np.sqrt(lo * hi)
    rate = mean_rate(mid)
    if abs(rate - target_rate) <= tol * target_rate / 100.0:
      return mid
    if rate > target_rate:
      lo = mid
    else:
      hi = mid
  return np.sqrt(lo * hi)


CARTESIAN_CENTRAL_LINES = 8  # reference myImageTransformations.py:73


def cartesian_num_lines(nx, acc, sample_n=CARTESIAN_CENTRAL_LINES):
  """Total sampled-line count of a static-acceleration cartesian mask.

  The single source of truth shared by the on-device generator
  (cartesian_mask) and the skinny-DC host gate (ops/dc.skinny_num_lines):
  reference f64 arithmetic `int(Nx // acc)` (compressed_sensing.py:94),
  floored at the guaranteed centre lines. Sharing it guarantees the skinny
  DC restores exactly the sampled rows for every legal acceleration
  (f32 vs f64 floor-division differs for e.g. acc=3.2)."""
  base = int(nx // float(acc))
  return max(base, int(sample_n)) if sample_n else base


def get_mask_generator_np(sampling_scheme, im_shape, acceleration_factor,
                          variable=False, rng=None):
  """Host-side mask generator closure (myImageTransformations.py:22-84)."""
  if rng is None:
    rng = np.random
  size = im_shape[-1]

  def mask_gen():
    if sampling_scheme == 'radial':
      if variable:
        x_in = np.arange(1, size // 2)
        acc_factors = rng.randint(1, len(x_in), im_shape[0])
        mask = np.array([
            radial_sampling_np((1, size, size), int(acc_factors[i]),
                               rand=True, golden_angle=True, centred=False,
                               rng=rng)
            for i in range(im_shape[0])])
        return mask.reshape(im_shape)
      return radial_sampling_np(im_shape, acceleration_factor, rand=True,
                                golden_angle=True, centred=False, rng=rng)
    # cartesian / varden
    if variable:
      mask = np.zeros(im_shape)
      for i in range(im_shape[0]):
        acc_r = float(rng.uniform(1, acceleration_factor * 1.5))
        mask[i] = cartesian_mask_np(im_shape[1:], acc_r,
                                    CARTESIAN_CENTRAL_LINES,
                                    centred=False, rng=rng)
      return mask
    return cartesian_mask_np(im_shape, acceleration_factor,
                             CARTESIAN_CENTRAL_LINES, centred=False, rng=rng)

  return mask_gen


# ---------------------------------------------------------------------------
# On-device (JAX) generators
# ---------------------------------------------------------------------------

def _cartesian_pdf(nx, acc, sample_n):
  """The kt-FOCUSS line pdf as a jnp array; mirrors cartesian_mask_np."""
  x = jnp.arange(nx) - nx / 2
  pdf = jnp.exp(-(0.5 / (nx / 10.) ** 2) * x ** 2)
  lmda = nx / (2. * acc)
  pdf = pdf + lmda / nx
  if sample_n:
    center = (jnp.arange(nx) >= nx // 2 - sample_n // 2) & \
             (jnp.arange(nx) < nx // 2 + sample_n // 2)
    pdf = jnp.where(center, 0.0, pdf)
    pdf = pdf / jnp.sum(pdf)
  return pdf


def cartesian_mask(key, shape, acc, sample_n=CARTESIAN_CENTRAL_LINES,
                   centred=False, keys=None):
  """Batched variable-density cartesian mask, on device.

  Parameters
  ----------
  key : jax PRNG key (ignored if ``keys`` given)
  shape : (batch, nx, ny) static shape
  acc : float or traced scalar or (batch,) array of per-example accelerations
    (variable acceleration, reference myImageTransformations.py:75-80)
  sample_n : int, number of guaranteed central lines
  keys : optional (batch,) array of per-example PRNG keys — used for
    deterministic per-slice validation masks (each slice index folds into a
    fixed base key), replacing the reference's stateful fixed-mask rotation

  Uses Gumbel top-k over log-pdf, which equals numpy's sequential
  choice-without-replacement (Plackett–Luce) in distribution while keeping
  all shapes static under jit.
  """
  batch, nx, ny = shape
  # Static accelerations take the host (reference f64 `int(Nx // acc)`,
  # cartesian_mask_np / compressed_sensing.py:94) line count — the SAME
  # arithmetic the skinny-DC gate uses (cartesian_num_lines), so the two
  # can never disagree. The traced f32 floor-divide disagrees with f64 for
  # non-integer accelerations (e.g. 256//3.2 → 80 in f32 vs 79 in f64) and
  # is kept only for traced per-example accelerations (variable
  # acceleration), where the skinny DC never applies.
  # numpy generics (np.float32(3.2)) are neither Python floats nor
  # ndarrays — include them, or they silently ride the f32 traced path
  # and can disagree with the host gate again.
  static_acc = isinstance(acc, (int, float, np.integer, np.floating)) or (
      isinstance(acc, np.ndarray) and acc.ndim == 0)
  if static_acc:
    pdf_count = cartesian_num_lines(nx, acc, sample_n) - (sample_n or 0)
    n_lines_b = jnp.full((batch,), pdf_count, jnp.int32)
  else:
    acc_t = jnp.asarray(acc, dtype=jnp.float32)
    n_lines_b = ((nx // jnp.broadcast_to(acc_t, (batch,)))
                 .astype(jnp.int32) - (sample_n if sample_n else 0))
  acc = jnp.asarray(acc, dtype=jnp.float32)
  acc_b = jnp.broadcast_to(acc, (batch,))

  if keys is None:
    keys = jax.random.split(key, batch)

  def one_mask(k, acc_i, n_lines):
    pdf = _cartesian_pdf(nx, acc_i, sample_n)
    gumbel = jax.random.gumbel(k, (nx,))
    scores = jnp.where(pdf > 0, jnp.log(pdf) + gumbel, -jnp.inf)
    # rank[i] = how many scores are strictly greater → top-n_lines selection
    # with a dynamic (traced) n_lines but static shapes.
    order = jnp.argsort(-scores)
    rank = jnp.argsort(order)
    mask_x = (rank < n_lines).astype(jnp.float32)
    if sample_n:
      idx = jnp.arange(nx)
      center = (idx >= nx // 2 - sample_n // 2) & \
               (idx < nx // 2 + sample_n // 2)
      mask_x = jnp.where(center, 1.0, mask_x)
    return jnp.broadcast_to(mask_x[:, None], (nx, ny))

  mask = jax.vmap(one_mask)(keys, acc_b, n_lines_b)
  if not centred:
    mask = jnp.fft.ifftshift(mask, axes=(-2, -1))
  return mask


def make_masks(key, batch, height, width, sampling_scheme='varden',
               acceleration_factor=8, variable_acceleration=False,
               sample_n=CARTESIAN_CENTRAL_LINES, keys=None):
  """On-device batched mask generation from undersampling config.

  Cartesian ('varden'/'cartesian') masks are generated fully on device.
  Variable acceleration draws per-example acc ~ U(1, 1.5·acc) as the
  reference does (myImageTransformations.py:75-80). ``keys`` overrides
  per-example randomness for deterministic validation masks.
  """
  if sampling_scheme in ('varden', 'cartesian'):
    if variable_acceleration:
      key, sub = jax.random.split(key)
      acc = jax.random.uniform(sub, (batch,), minval=1.0,
                               maxval=acceleration_factor * 1.5)
    else:
      acc = float(acceleration_factor)
    return cartesian_mask(key, (batch, height, width), acc,
                          sample_n=sample_n, centred=False, keys=keys)
  elif sampling_scheme == 'radial':
    # Spoke rasterization is scatter-heavy; generate on host per call.
    # Radial masks are data-independent, so this sits outside the jitted
    # step and overlaps with device compute.
    seed = int(jax.random.randint(key, (), 0, 2 ** 31 - 1))
    rng = np.random.RandomState(seed)
    mask = radial_sampling_np((batch, height, width),
                              int(acceleration_factor), rand=True,
                              golden_angle=True, centred=False, rng=rng)
    return jnp.asarray(mask, dtype=jnp.float32)
  else:
    raise ValueError('Unknown sampling scheme {}'.format(sampling_scheme))
