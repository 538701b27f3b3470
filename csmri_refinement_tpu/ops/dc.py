"""K-space data-consistency operator — the RecNet hot op.

Rebuild of ``DataConsistencyInKspace``
(/root/reference/data/reconstruction/deep_med_lib/my_pytorch/myfft.py:131-163):

    k   = fft2(x)                    # ortho, unshifted
    out = (1 - mask) * k + k0        # noiseless merge (myfft.py:141)
    x'  = ifft2(out)

The reference needs a CUDA-only pytorch_fft extension plus hand-written
conjugate-transpose backward passes; here the whole op is a pure jittable
function on complex64 — XLA lowers to the TPU's native FFT and autodiff is
exact (verified against numerical gradients in tests/test_dc.py).

The elementwise k-space merge is also available as a Pallas kernel
(:mod:`csmri_refinement_tpu.ops.dc_pallas`); `data_consistency` picks it up
when enabled.
"""

import functools
import os

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.ops import fft

# DC backend selection: 'auto' picks the batched-GEMM
# split-real path on TPU-like backends (1.05 ms vs 2.37 ms for the Pallas
# per-image kernel and 3.3 ms for the complex matmul-DFT path at B128@256²
# on v5e — the big einsum GEMMs keep the MXU busy across the whole batch,
# where the per-image Pallas grid serializes 256³ matmuls).
# CSMRI_TPU_FUSED_DC=1 forces the Pallas kernel, =0 the complex path.
_FUSED_MODE = os.environ.get('CSMRI_TPU_FUSED_DC', 'auto')


# Set by the runners when the device mesh has a `spatial` axis: image rows
# are sharded, and XLA:CPU's fft thunk rejects the non-dim0-major layouts
# the partitioner produces around FFT HLOs — while the GEMM DC lowering
# partitions cleanly on every backend (tests/test_parallel.py). TPU always
# uses the GEMM path anyway, so this only changes CPU/GPU mesh runs.
_SPATIAL_MESH = False

# Set by utils/export.py while tracing a jax.export serving artifact: the
# artifact bakes ONE lowering for every target platform, and the GEMM
# split-real path is the only DC lowering that is both the TPU-optimal
# choice and platform-neutral (no complex dot_general, no FFT HLO, no
# Pallas custom call).
_FORCE_GEMM = False


def set_spatial_mesh(active):
  """Declare that subsequent jitted steps run under a spatially-sharded
  mesh (H axis partitioned), forcing the GEMM DC lowering on all
  backends. Also forwards to ops.fft so the on-device forward model's
  fft2/ifft2 (ops/undersample.py) ride the matmul-DFT — XLA:CPU's fft
  thunk rejects the partitioner's layouts there too."""
  global _SPATIAL_MESH
  _SPATIAL_MESH = bool(active)
  fft.set_spatial_mesh(active)


def force_gemm(active):
  """Force the batched-GEMM split-real DC lowering regardless of backend
  (multi-platform export; see module comment on ``_FORCE_GEMM``)."""
  global _FORCE_GEMM
  _FORCE_GEMM = bool(active)


def _gemm_mode(h, w, noise_lvl):
  """Pick the DC lowering: 'einsum' (batched GEMM split-real, any
  rectangular shape), 'pallas' (per-image fused kernel, square only), or
  None (complex matmul-DFT composition — CPU/GPU backends and the noisy
  merge variant, which only that path implements)."""
  if noise_lvl is not None:
    return None
  if _FUSED_MODE == '1':
    return 'pallas' if h == w else None  # Pallas kernel is square-only
  if _FUSED_MODE == '0':
    return None
  if _SPATIAL_MESH or _FORCE_GEMM:
    return 'einsum'
  if jax.default_backend() in ('cpu', 'gpu', 'cuda', 'rocm'):
    return None
  return 'einsum'


@jax.custom_vjp
def _dc_fused(x, k0, mask):
  from csmri_refinement_tpu.ops.dc_pallas import dc_pallas
  # Interpret mode keeps the forced-fused path testable on CPU
  return dc_pallas(x, k0, mask, interpret=jax.default_backend() == 'cpu')


def _dc_fused_fwd(x, k0, mask):
  return _dc_fused(x, k0, mask), mask


def _dc_fused_bwd(mask, g):
  """DC is complex-linear: y = F⁻¹((1-m)·F x + k0).

  The x-Jacobian F⁻¹(1-m)F is Hermitian (unitary F, real diagonal mask), so
  its real-split transpose is the op itself: grad_x = DC(g, 0, m). The
  k0-Jacobian is the ortho inverse DFT, whose real-split transpose is the
  forward DFT: grad_k0 = fft2(g). (The reference hand-writes the same
  conjugate-transpose structure in myfft.py:36-46.)
  """
  zeros = jnp.zeros_like(g)
  grad_x = _dc_fused(g, zeros, mask)
  grad_k0 = fft.pack_complex(fft.fft2(fft.unpack_complex(g)))
  return grad_x, grad_k0, None


_dc_fused.defvjp(_dc_fused_fwd, _dc_fused_bwd)


def _split_mats(n, inverse, scale, twiddle_parent=0, row_side=True):
  import numpy as np
  f = fft._scaled_dft_np(n, inverse, scale, twiddle_parent, row_side)
  return (jnp.asarray(np.real(f), jnp.float32),
          jnp.asarray(np.imag(f), jnp.float32))


def _split_twiddle(n, inverse):
  import numpy as np
  w = fft._twiddle_np(n, inverse)
  return (jnp.asarray(np.real(w), jnp.float32),
          jnp.asarray(np.imag(w), jnp.float32))


# Dense block-GEMM DC lowering (round 3): one real GEMM per transform side
# instead of four, with the complex algebra AND the packed-complex layout
# permutations folded into the constant matrices. MEASURED LOSER on the
# v5e (NOTES round 3: 1.76 vs 1.13 ms B128@256², 3.13 vs 2.41 B32@512²)
# despite identical MACs — the (2n, 2n) GEMMs tile worse than the four
# (n, n) split-real GEMMs whose combines XLA fuses into the epilogue.
# Kept off by default; CSMRI_TPU_DC_BLOCK=1 re-enables for re-measurement.
_DC_BLOCK = os.environ.get('CSMRI_TPU_DC_BLOCK', '0') != '0'


@functools.lru_cache(maxsize=None)
def _bmat(n, inverse, scale, in_layout, out_layout, side):
  """(2n, 2n) real matrix applying the complex (i)DFT·scale as ONE GEMM.

  The real/imag components ride the transform axis itself, so a complex
  transform over axis length n becomes a real GEMM over axis length 2n —
  same MACs as the 4-GEMM split-real form, but no operand re-reads and no
  elementwise combine passes over (B, H, W) planes (the measured overhead
  of the dense-DFT DC at 512², NOTES round 3).

  ``in_layout``/``out_layout`` choose how re/im sit on the doubled axis:
  'i' = interleaved (index 2j+c, i.e. a packed trailing (n, 2) pair viewed
  flat, or a (n, 2, ...) pair viewed flat on a leading axis) or 'b' =
  blocked (index c·n+j, i.e. a (2, n) split). Choosing layouts per call
  site makes every relayout between packed complex and the GEMM chain a
  pure reshape — the permutations live in the constant matrix.

  ``side``: 'right' gives M[in, out] for ``z @ M``; 'left' gives
  M[out, in] for ``M @ z``.
  """
  import numpy as np
  f = fft._scaled_dft_np(n, inverse, scale)
  fr = np.real(f).astype(np.float32)
  fi = np.imag(f).astype(np.float32)
  m = np.zeros((2 * n, 2 * n), np.float32)

  def sl(layout, c):
    return slice(c, None, 2) if layout == 'i' else slice(c * n, (c + 1) * n)

  # out_re = zr·fr − zi·fi ; out_im = zr·fi + zi·fr   (f is symmetric, so
  # the same entries serve both mult sides; only the index roles swap)
  for (ci, co), blk in (((0, 0), fr), ((1, 0), -fi),
                        ((0, 1), fi), ((1, 1), fr)):
    if side == 'right':
      m[sl(in_layout, ci), sl(out_layout, co)] = blk
    else:
      m[sl(out_layout, co), sl(in_layout, ci)] = blk
  # Cache the NUMPY matrix: converting under a trace would cache (and
  # leak) a tracer-tainted constant across traces (UnexpectedTracerError).
  return m


def _dc_block(x, k0, mask):
  """Dense DC as four real GEMMs total (one per transform side).

  Data stays in packed/compact layouts end to end: the packed (B,H,W,2)
  input is *reshaped* (never transposed) into each GEMM, because the
  re/im interleave and block permutations are folded into `_bmat`'s
  constants. The only elementwise pass left is the masked k-space merge.
  """
  b, h, w = x.shape[0], x.shape[-3], x.shape[-2]
  hs, ws = h ** -0.5, w ** -0.5
  z = x.astype(jnp.float32).reshape(b, h, 2 * w)       # (w,2) pairs, flat
  z = jnp.einsum('bhk,kw->bhw', z, _bmat(w, False, ws, 'i', 'b', 'right'),
                 precision='high')                      # … @ F_w
  z = z.reshape(b, h, 2, w)
  z = jnp.einsum('ik,bkw->biw', _bmat(h, False, hs, 'i', 'i', 'left'),
                 z.reshape(b, 2 * h, w), precision='high')  # F_h @ …
  z = z.reshape(b, h, 2, w)
  m = mask[..., 0].astype(jnp.float32)[:, :, None, :]
  k0b = jnp.moveaxis(k0.astype(jnp.float32), -1, -2)   # fuses into merge
  z = (1.0 - m) * z + k0b
  z = jnp.einsum('ik,bkw->biw', _bmat(h, True, hs, 'i', 'i', 'left'),
                 z.reshape(b, 2 * h, w), precision='high')  # conj(F_h) @ …
  z = z.reshape(b, h, 2, w)
  z = jnp.einsum('bhk,kw->bhw', z.reshape(b, h, 2 * w),
                 _bmat(w, True, ws, 'b', 'i', 'right'),
                 precision='high')                      # … @ conj(F_w)
  return z.reshape(b, h, w, 2)


def _dft_axis_split(br, bi, inverse, scale, last_axis):
  """Split-real (i)DFT·scale over rows (-2) or cols (-1) of (B, H, W)
  planes as batched GEMMs, with radix-2 Cooley-Tukey splits above
  ``fft._RADIX_BASE`` (matmul FLOPs halve per split level — the dense DFT
  is the wrong algorithm at 512+).

  The einsums compile to single large dot_generals (N = B·W resp.
  M = B·H), unlike a per-image Pallas grid — 2.3× faster at B128@256² on
  v5e.
  """
  n = br.shape[-1] if last_axis else br.shape[-2]
  if n <= fft._RADIX_BASE or n % 2:
    fr, fi = _split_mats(n, inverse, scale)
    # DC is precision-critical (quality target: 0.1 dB): TPU's default
    # matmul precision is one bf16 pass (~2e-2 abs error on these k-space
    # merges — measured); 'high' (bf16x3) restores ~1e-4, 'highest' would
    # double that cost again for digits the recon never sees.
    if last_axis:
      mm = lambda a, c: jnp.einsum('bhk,kw->bhw', a, c, precision='high')
    else:
      mm = lambda a, c: jnp.einsum('hk,bkw->bhw', c, a, precision='high')
    return (mm(br, fr) - mm(bi, fi), mm(bi, fr) + mm(br, fi))
  if last_axis:
    ev = (br[..., 0::2], bi[..., 0::2])
    od = (br[..., 1::2], bi[..., 1::2])
  else:
    ev = (br[..., 0::2, :], bi[..., 0::2, :])
    od = (br[..., 1::2, :], bi[..., 1::2, :])
  er, ei = _dft_axis_split(ev[0], ev[1], inverse, scale, last_axis)
  half = n // 2
  if half <= fft._RADIX_BASE or half % 2:
    # children are dense: fold the DIT twiddle diag(w) into the odd
    # child's matrices — skips the 6-pass elementwise complex twiddle
    # over the whole batch (the measured 512^2 DC overhead, NOTES r3)
    fr, fi = _split_mats(half, inverse, scale, twiddle_parent=n,
                         row_side=not last_axis)
    if last_axis:
      mm = lambda a, c: jnp.einsum('bhk,kw->bhw', a, c, precision='high')
    else:
      mm = lambda a, c: jnp.einsum('hk,bkw->bhw', c, a, precision='high')
    tr = mm(od[0], fr) - mm(od[1], fi)
    ti = mm(od[1], fr) + mm(od[0], fi)
  else:
    orr, oi = _dft_axis_split(od[0], od[1], inverse, scale, last_axis)
    wr, wi = _split_twiddle(n, inverse)
    if not last_axis:
      wr, wi = wr[:, None], wi[:, None]
    tr = wr * orr - wi * oi
    ti = wr * oi + wi * orr
  axis = -1 if last_axis else -2
  return (jnp.concatenate([er + tr, er - tr], axis=axis),
          jnp.concatenate([ei + ti, ei - ti], axis=axis))


@jax.custom_vjp
def _dc_einsum(x, k0, mask):
  """GEMM DC: dense block lowering (one GEMM per transform side) up to
  ``fft._RADIX_BASE``; split-real batched GEMMs with radix-2 splits
  above it."""
  h, w = x.shape[-3], x.shape[-2]
  if _DC_BLOCK and h <= fft._RADIX_BASE and w <= fft._RADIX_BASE:
    return _dc_block(x, k0.astype(jnp.float32), mask)
  hs, ws = h ** -0.5, w ** -0.5

  ar, ai = x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32)
  tr, ti = _dft_axis_split(ar, ai, False, hs, last_axis=False)  # F_h @ x
  kr, ki = _dft_axis_split(tr, ti, False, ws, last_axis=True)   # … @ F_w
  m = mask[..., 0].astype(jnp.float32)
  kr = (1.0 - m) * kr + k0[..., 0]
  ki = (1.0 - m) * ki + k0[..., 1]
  tr, ti = _dft_axis_split(kr, ki, True, hs, last_axis=False)   # conj(F_h) @ k
  yr, yi = _dft_axis_split(tr, ti, True, ws, last_axis=True)    # … @ conj(F_w)
  return jnp.stack([yr, yi], axis=-1)


def _dc_einsum_fwd(x, k0, mask):
  return _dc_einsum(x, k0, mask), mask


def _dc_einsum_bwd(mask, g):
  # Same Hermitian structure as the fused kernel's VJP (see _dc_fused_bwd).
  # grad_k0 = F(g) uses the same GEMM-DFT lowering as the forward: keeps
  # backward precision pinned like the forward, and keeps the mesh path
  # free of FFT HLOs (XLA:CPU's fft thunk rejects the non-dim0-major
  # layouts GSPMD produces under spatial sharding).
  zeros = jnp.zeros_like(g)
  grad_x = _dc_einsum(g, zeros, mask)
  h, w = g.shape[-3], g.shape[-2]
  gr, gi = g[..., 0].astype(jnp.float32), g[..., 1].astype(jnp.float32)
  tr, ti = _dft_axis_split(gr, gi, False, h ** -0.5, last_axis=False)
  kr, ki = _dft_axis_split(tr, ti, False, w ** -0.5, last_axis=True)
  grad_k0 = jnp.stack([kr, ki], axis=-1)
  return grad_x, grad_k0, None


_dc_einsum.defvjp(_dc_einsum_fwd, _dc_einsum_bwd)


# --- Skinny (sampled-lines) DC lowering ------------------------------------
#
# The flagship undersampling family is a Cartesian *line* mask: mask[b,h,w]
# == r[b,h] with a FIXED number K of sampled rows (ops/masks.cartesian_mask
# draws exactly nx//acc lines via Gumbel top-k + guaranteed centre lines).
# For such masks the dense DC wastes ~94% of its GEMM FLOPs: writing
#
#     DC(x) = F^-1((1-m)Fx + k0) = x - F^-1(m Fx) + F^-1 k0
#
# the row-selection m = P_S' P_S commutes past the W-axis transform, which
# cancels against its inverse (F_w F_w^-1 = I):
#
#     F^-1(m F x) = F_h^-1[:, S] (F_h[S, :] x)
#
# i.e. two *skinny* (K x H / H x K) GEMMs along H only — K/H of ONE axis
# transform each, vs 4 full axis transforms for the dense DC. F^-1 k0 is
# x-independent (k0 is supported on the sampled rows only,
# ops/undersample.py:45) and is computed once per forward pass and shared
# across all of a cascade's DC layers. The algebra is exact — same ortho
# DFT constants, same pinned 'high' precision — so this is a lossless
# lowering, gated on the config guaranteeing the fixed-count line
# structure (models/recnet.py threads `dc_lines_acc` from the
# `undersampling` section). CSMRI_TPU_DC_SKINNY=0 disables.
_SKINNY_MODE = os.environ.get('CSMRI_TPU_DC_SKINNY', 'auto')


def skinny_supported():
  """Skinny DC gate: on unless CSMRI_TPU_DC_SKINNY=0."""
  return _SKINNY_MODE != '0'


def lines_acc_from_undersampling(us):
  """Static acceleration divisor when the undersampling config guarantees
  a fixed-count Cartesian line mask; None otherwise (radial masks are not
  line-structured, variable acceleration has a per-example line count)."""
  if not us:
    return None
  if us.get('sampling_scheme', 'varden') not in ('varden', 'cartesian'):
    return None
  if us.get('variable_acceleration', False):
    return None
  return float(us.get('acceleration_factor', 8))


def skinny_num_lines(h, acc, sample_n=None):
  """Exact sampled-line count of ops/masks.cartesian_mask: nx//acc pdf +
  centre lines, floored at the ``sample_n`` guaranteed centre lines.
  Delegates to masks.cartesian_num_lines — the same helper the on-device
  generator uses for static accelerations — so the gate and the generator
  cannot disagree (ADVICE r3: f32 vs f64 floor division differs at
  e.g. acc=3.2)."""
  from csmri_refinement_tpu.ops import masks as mask_ops
  if sample_n is None:
    sample_n = mask_ops.CARTESIAN_CENTRAL_LINES
  return mask_ops.cartesian_num_lines(h, acc, sample_n)


def _skinny_synth(g_cat, tr, ti):
  """u = F_h^-1[:, S] t with F^-1 = conj(F) (symmetric unitary ortho DFT):
  u[h] = sum_j conj(G[j, h]) t[j] for the gathered rows G = F[S, :].

  ``g_cat`` is the (B, 2K, H) [Gr; Gi] stack: packing re/im along the
  contraction axis doubles it to 2K (full 128-lane MXU util at the
  flagship K=64 — measured 3.16→2.23 ms per DC at B128@512², NOTES r3)
  and the complex combine folds into the operand stacking:
  u_re = [Gr; Gi]·[tr; ti], u_im = [Gr; Gi]·[ti; -tr]. The concats touch
  only (B, 2K, W) slabs — full-plane (B, H, W) relayouts are the measured
  loser on this chip (NOTES rounds 2-3)."""
  t_rt = jnp.concatenate([tr, ti], axis=1)
  t_ir = jnp.concatenate([ti, -tr], axis=1)
  mm = lambda g, t: jnp.einsum('bkh,bkw->bhw', g, t, precision='high')
  return mm(g_cat, t_rt), mm(g_cat, t_ir)


def skinny_dc_context(k0, mask, num_lines, x0=None):
  """Per-example sampled-row context for the skinny DC, computed once per
  forward pass and shared across a cascade's DC layers.

  Parameters
  ----------
  k0 : (B, H, W, 2) float — sampled k-space (zero off the sampled lines)
  mask : (B, H, W, 1+) float line mask (mask[b,h,w] == r[b,h])
  num_lines : static int — EXACT number of sampled rows per example
  x0 : optional (B, H, W, 2) float — the zero-filled reconstruction
    ifft2(k0), when the caller already has it (the shipped pipeline's
    ``inp`` IS ifft2(kspace), ops/undersample.py:92); skips recomputing it

  Returns
  -------
  (g_cat, x0): gathered forward-DFT rows [Re F_h[S, :]; Im F_h[S, :]]
  stacked as (B, 2K, H), and the zero-filled reconstruction x0 = ifft2(k0)
  as (B, H, W, 2).
  """
  h, w = k0.shape[-3], k0.shape[-2]
  rows = jnp.max(mask[..., 0], axis=-1)                # (B, H) line indicator
  _, idx = jax.lax.top_k(rows, num_lines)              # (B, K) sampled rows
  fr, fi = _split_mats(h, False, h ** -0.5)
  g_cat = jnp.concatenate([jnp.take(fr, idx, axis=0),
                           jnp.take(fi, idx, axis=0)], axis=1)  # (B, 2K, H)
  if x0 is not None:
    return g_cat, x0.astype(jnp.float32)
  # x0 = F_h^-1[:, S] (k0[S, :] @ F_w^-1): W-side inverse on the K-row
  # slab (K/H of a full axis transform), then the skinny H-side synthesis.
  k0r = jnp.take_along_axis(k0[..., 0].astype(jnp.float32),
                            idx[..., None], axis=-2)   # (B, K, W)
  k0i = jnp.take_along_axis(k0[..., 1].astype(jnp.float32),
                            idx[..., None], axis=-2)
  fwr, fwi = _split_mats(w, False, w ** -0.5)
  mm = lambda a, c: jnp.einsum('bkv,vw->bkw', a, c, precision='high')
  sr = mm(k0r, fwr) + mm(k0i, fwi)                     # k0[S, :] @ conj(F_w)
  si = mm(k0i, fwr) - mm(k0r, fwi)
  x0r, x0i = _skinny_synth(g_cat, sr, si)
  return g_cat, jnp.stack([x0r, x0i], axis=-1)


def _dc_skinny(x, ctx):
  """DC(x) = x - F_h^-1[:, S] F_h[S, :] x + x0 — four skinny GEMMs along
  H, each with the re/im pair packed to 2K rows/lanes for full MXU util
  (see _skinny_synth; the analysis side packs the OUTPUT rows instead:
  [Gr; Gi]·xr = [Gr xr; Gi xr], so both analysis GEMMs run at M=2K).

  Pure einsums: JAX autodiff yields the transposed skinny einsums (the
  x-Jacobian I - A_S is Hermitian, A_S an orthogonal projection), so no
  custom VJP is needed for efficiency, and the pinned precision carries
  into the backward pass."""
  g_cat, x0 = ctx
  k = g_cat.shape[1] // 2
  xr = x[..., 0].astype(jnp.float32)
  xi = x[..., 1].astype(jnp.float32)
  mm = lambda g, a: jnp.einsum('bkh,bhw->bkw', g, a, precision='high')
  a = mm(g_cat, xr)                                    # [Gr xr; Gi xr]
  b = mm(g_cat, xi)                                    # [Gr xi; Gi xi]
  tr = a[:, :k] - b[:, k:]                             # F_h[S, :] x (re)
  ti = b[:, :k] + a[:, k:]                             # F_h[S, :] x (im)
  ur, ui = _skinny_synth(g_cat, tr, ti)                # F_h^-1[:, S] t
  return jnp.stack([xr - ur + x0[..., 0], xi - ui + x0[..., 1]], axis=-1)


def kspace_merge_reference(k, k0, mask, noise_lvl=None):
  """Merge predicted k-space with sampled lines (myfft.py:131-142)."""
  if noise_lvl:
    return (1 - mask) * k + mask * (k + noise_lvl * k0) / (1 + noise_lvl)
  return (1 - mask) * k + k0


def data_consistency(x, k0, mask, noise_lvl=None, skinny_ctx=None):
  """Data-consistency step on packed arrays.

  Parameters
  ----------
  x : (B, H, W, 2) float — current image estimate (real/imag channels)
  k0 : (B, H, W, 2) float — originally sampled k-space
  mask : (B, H, W, 1) or (B, H, W, 2) float — 1 where k-space was sampled
  skinny_ctx : optional result of :func:`skinny_dc_context` — exact
    sampled-lines lowering for fixed-count Cartesian line masks (~1/16th
    the GEMM FLOPs; the caller owns the line-structure guarantee)

  Returns
  -------
  (B, H, W, 2) float image with sampled k-space lines restored.
  """
  if skinny_ctx is not None and noise_lvl is None:
    return _dc_skinny(x, skinny_ctx)
  mode = _gemm_mode(x.shape[-3], x.shape[-2], noise_lvl)
  if mode == 'einsum':
    return _dc_einsum(x, k0.astype(jnp.float32), mask)
  if mode == 'pallas':
    return _dc_fused(x, k0, mask)

  xc = fft.unpack_complex(x)
  k0c = fft.unpack_complex(k0)
  m = mask[..., 0]

  k = fft.fft2(xc)
  out = kspace_merge_reference(k, k0c, m, noise_lvl)
  x_res = fft.ifft2(out)
  return fft.pack_complex(x_res)


def data_consistency_complex(xc, k0c, m, noise_lvl=None):
  """Same op on complex64 arrays (B, H, W); used inside fused cascades."""
  k = fft.fft2(xc)
  out = kspace_merge_reference(k, k0c, m, noise_lvl)
  return fft.ifft2(out)


def data_consistency_np(x, y, mask, norm='ortho'):
  """Host/numpy data consistency for golden tests
  (reference compressed_sensing.py:515-529, centered=False path)."""
  import numpy as np
  xf = np.fft.fft2(x, axes=(-2, -1), norm=norm)
  xm = (1 - mask) * xf + y
  return np.fft.ifft2(xm, axes=(-2, -1), norm=norm)
