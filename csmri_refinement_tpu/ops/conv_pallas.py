"""Pallas TPU kernel: fused multi-layer SAME convolution chains.

Rebuilds the conv hot loop of the reference models
(/root/reference/models/unet.py:77-136, /root/reference/models/recnet.py:29-62)
as a TPU-first Mosaic kernel instead of per-layer XLA convolutions.

Motivation (NOTES.md round-2 envelope): the U-Net/RecNet convs at C=32/64
are bound by the XLA conv emitter's effective ~2 TB/s activation traffic,
not by MXU FLOPs — k4 32->32 B128@256^2 measures 3.34 ms (82 TFLOPS) against
a 1.4 ms MXU floor. This kernel restructures the conv as dense matmuls with
a pixel-packed layout so the MXU contraction is always >=128 lanes wide:

  * Each sublane row holds a *group* of P consecutive pixels with all Cin
    channels: lane = p*Cin + c, with P the smallest width divisor with
    P*Cin >= 128 (P=4 for C=32, P=2 for C=64, P=1 for C>=128).
  * A k-wide SAME conv of one group needs the pixel window
    [P*g - 1, P*g - 1 + P + k - 2] (left SAME pad is 1 for k in {3, 4}).
    That window is covered by n_ops = ceil((P+k-1)/P) group-aligned copies
    of S = "input shifted right by one pixel". S is built with ONE flat
    lane roll (+ sublane carry select); the remaining operands are sublane
    rolls of S. No im2col materialization (round-1's measured loser).
  * Per height tap dy and operand j, one dense matmul
    (rows*G, P*Cin) @ (P*Cin, P*Cout) accumulates in f32. The weight
    matrix is a block-Toeplitz packing of the (k, k, Cin, Cout) kernel;
    MXU slot utilization is k_w/(n_ops*P) — 50% (C=32), 67% (C=64),
    100% (C=128) vs the conv emitter's measured ~42%.
  * Reflect/replicate/zero SAME padding is exact and in-kernel: width
    edges are fixed up with masked rolls of the original rows; height
    pad rows are VMEM row copies. This removes the border-strip convs of
    the fast reflect path (models/layers.py:49-114) entirely.
  * Multi-layer fusion: a whole ConvEncodeUnit chain (conv + folded BN +
    LeakyReLU, x num_layers) runs per batch element with intermediates
    resident in VMEM; HBM sees one read of the input and one write of
    the final output. Pad rows of intermediate layers are reflect-copies
    of that layer's own valid output rows — identical to applying SAME
    padding per layer on the true activation (over-padding the chain
    input would be wrong for k=4's asymmetric taps).

BatchNorm in eval mode (running stats) folds into per-channel weight
scale + bias before packing, so `bias` here is the folded affine shift.
Training-mode BN needs batch statistics and keeps the XLA path.
"""

import functools
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class ChainLayer(NamedTuple):
  """One conv (+ optional activation) of a fused chain.

  kernel: (k, k, Cin, Cout) HWIO (flax layout), any float dtype — or int8
          in the quantized serving mode (then ``w_scale`` holds the
          per-output-channel dequantization scales).
  bias:   (Cout,) or None. BN (eval mode) must already be folded in.
  leakiness: LeakyReLU negative slope, or None for a linear layer.
  w_scale: (Cout,) f32 per-channel weight scales (int8 mode only).
  """
  kernel: Any
  bias: Optional[Any] = None
  leakiness: Optional[float] = None
  w_scale: Optional[Any] = None


def _pick_p(cin, width):
  """Pixels per group: smallest P with P*Cin >= 128 that divides width."""
  p = max(1, -(-128 // cin))
  while width % p:
    p += 1
  return p


def _n_ops(p, k):
  return -(-(p + k - 1) // p)


def _edge_fixups(p, k, g, pad_mode):
  """Static fixup table for width-edge groups of each operand.

  Returns {j: [(g_mod, sp, dg, dl)]}: in operand j, sublane rows with
  group%G == g_mod get lane block sp (pixels) replaced by the value at
  sublane offset dg / pixel-lane offset dl of the unshifted input
  (reflect/replicate), or zeroed (dg is None for zero padding).
  """
  w = g * p
  fixups = {}
  for j in range(_n_ops(p, k)):
    for m in range(j + 1):          # only the last j+1 groups can cross
      gm = g - 1 - m
      for sp in range(p):
        pix = p * (gm + j) - 1 + sp
        if pix < w:
          continue
        # slot entirely unused by this operand's weights -> skip
        if not any(0 <= j * p + sp - so < k for so in range(p)):
          continue
        if pad_mode == 'zero':
          fixups.setdefault(j, []).append((gm, sp, None, None))
          continue
        e = pix - w
        tgt = w - 2 - e if pad_mode == 'reflection' else w - 1
        tg, tsp = divmod(tgt, p)
        fixups.setdefault(j, []).append((gm, sp, tg - gm, tsp - sp))
  # left edge: operand 0, first group of each row, slot 0 = pixel -1
  if pad_mode == 'zero':
    fixups.setdefault(0, []).insert(0, (0, 0, None, None))
  else:
    tgt = 1 if pad_mode == 'reflection' else 0
    tg, tsp = divmod(tgt, p)
    fixups.setdefault(0, []).insert(0, (0, 0, tg, tsp))
  return fixups


class _LayerPlan(NamedTuple):
  cin: int
  cout: int
  k: int
  p: int
  g: int
  n_ops: int
  leakiness: Optional[float]
  fixups: Any


def _plan(layers, width, pad_mode):
  shapes = [layer.kernel.shape for layer in layers]
  for kh, kw, _, _ in shapes:
    assert kh == kw and kh in (3, 4), 'fused chain supports k in (3, 4)'
  ps = [_pick_p(cin, width) for _, _, cin, _ in shapes]
  # Chain repacks must only ever SPLIT lanes (Mosaic rejects the merging
  # (A, L) -> (A/2, 2L) shape cast): force P non-increasing along the
  # chain, at a utilization cost on widening-P layers (e.g. 64->32 runs
  # at P=4/50% instead of P=2/67%).
  for i in range(len(ps) - 2, -1, -1):
    ps[i] = max(ps[i], ps[i + 1])
  plans = []
  for layer, p in zip(layers, ps):
    kh, kw, cin, cout = layer.kernel.shape
    g = width // p
    plans.append(_LayerPlan(cin, cout, kw, p, g, _n_ops(p, kw),
                            layer.leakiness, _edge_fixups(p, kw, g, pad_mode)))
  return plans


def _pack_weights(w, p):
  """Block-Toeplitz packing: (k, k, Cin, Cout) -> (n_ops*k, P*Cin, P*Cout).

  Entry [j*k + dy, sp*Cin + ci, so*Cout + co] = w[dy, j*P + sp - so, ci, co]
  when that width tap is in [0, k), else 0.
  """
  kh, kw, cin, cout = w.shape
  n = _n_ops(p, kw)
  w = w.astype(jnp.float32)
  zero = jnp.zeros((cin, cout), jnp.float32)
  blocks = []
  for j in range(n):
    for dy in range(kh):
      rows = []
      for sp in range(p):
        cols = [w[dy, j * p + sp - so] if 0 <= j * p + sp - so < kw else zero
                for so in range(p)]
        rows.append(jnp.concatenate(cols, axis=1))
      blocks.append(jnp.concatenate(rows, axis=0))
  return jnp.stack(blocks)


def _lane_roll(v, shift):
  """Static circular lane roll (result[:, l] = v[:, l - shift]), bf16-safe.

  This Mosaic/libtpu build rejects ``tpu.dynamic_rotate`` on sub-32-bit
  data ("Rotate with non-32-bit data"); ride an i32 bitcast view instead.
  ``pltpu.bitcast`` packs sublane row PAIRS into one i32 row and leaves the
  lane dimension untouched, so a lane roll of the i32 view rolls both
  packed bf16 rows identically and the inverse bitcast restores them
  (measured OK: scripts/probe_mosaic_prims.py).
  """
  l = v.shape[-1]
  shift %= l
  if shift == 0:
    return v
  if v.dtype.itemsize == 4:
    return pltpu.roll(v, shift, axis=1)
  packing = 4 // v.dtype.itemsize
  assert v.shape[0] % packing == 0, 'sub-32-bit lane roll: row count must ' \
      'be divisible by the i32 packing factor'
  i = pltpu.bitcast(v, jnp.int32)
  i = pltpu.roll(i, shift, axis=1)
  return pltpu.bitcast(i, v.dtype)


def _group_fixups(entries, cl, l_in):
  """Group edge-fixup entries for one operand into batched applications.

  Returns [(dg, perm, [(g_mod, sp), ...])]: all entries sharing a source
  row offset ``dg`` apply as ONE fused where() whose replacement value is
  the dg-offset slab slice, lane-permuted by a single one-hot matmul
  (``perm``; None when every slot reads its own lane block, i.e. dl == 0).
  Zero-pad entries group under dg None. A destination slot demanded from
  two different source slots (possible only at tiny widths) splits into
  separate groups.
  """
  import numpy as np
  zero_ents = [(gm, sp) for gm, sp, dg, dl in entries if dg is None]
  by_dg = {}
  for gm, sp, dg, dl in entries:
    if dg is not None:
      by_dg.setdefault(dg, []).append((gm, sp, dl))
  out = []
  if zero_ents:
    out.append((None, None, zero_ents))
  for dg, ents in sorted(by_dg.items()):
    subgroups = []
    for gm, sp, dl in ents:
      placed = False
      for sub in subgroups:
        if all(sp != sp2 or dl == dl2 for _, sp2, dl2 in sub):
          sub.append((gm, sp, dl))
          placed = True
          break
      if not placed:
        subgroups.append([(gm, sp, dl)])
    for sub in subgroups:
      if all(dl == 0 for _, _, dl in sub):
        perm = None
      else:
        perm = np.zeros((l_in, l_in), np.float32)
        for _, sp, dl in sub:
          src0 = (sp + dl) * cl
          perm[src0:src0 + cl, sp * cl:(sp + 1) * cl] = np.eye(cl)
      out.append((dg, perm, [(gm, sp) for gm, sp, _ in sub]))
  return out


# Guard rows: real slab row s lives at ref row s + _TOP. Top guards absorb
# the shifted reads at offset -1 and reflect fixups with negative row
# offsets (dg >= -(k-2)); bottom guards absorb reads at offsets + n_ops.
# Guards are zeroed so out-of-range reads hit 0 (they only ever multiply
# zero weight blocks or are overwritten by edge fixups).
_TOP = 4
_BOT = 4


def _chain_kernel(*refs, plans, groups, n_perms, height, pad_mode, cdtype,
                  quant=False, odtype=None):
  """refs: x_ref, [act-scale ref in int8 mode], (w_ref, b_ref[, s_ref])
  per layer, fixup permutation matrices, out_ref, then per layer a slab
  scratch and a shifted-slab scratch.
  ``groups[li][j]`` = [(dg, perm_input_index_or_None, ((g_mod, sp), ...))].

  int8 serving mode (``quant``): slabs/operands/weights are int8, matmuls
  accumulate in int32, each layer's epilogue dequantizes to f32 (act scale
  x per-channel weight scale), applies bias + LeakyReLU, then dynamically
  requantizes for the next layer; the last layer writes ``odtype``.

  Mosaic constraint driving the structure (probe_mosaic_prims.py): bf16
  vectors cannot be sublane-rotated, but VMEM refs CAN be read/written at
  arbitrary (unaligned) row offsets. All pixel/row shifts are therefore
  expressed as ref slices at static offsets; the only vector shifts are
  lane rolls via ``_lane_roll``.
  """
  nl = len(plans)
  stride = 3 if quant else 2
  x_ref = refs[0]
  base = 1
  if quant:
    a0_ref = refs[1]
    base = 2
  w_refs = [refs[base + stride * i] for i in range(nl)]
  b_refs = [refs[base + 1 + stride * i] for i in range(nl)]
  if quant:
    s_refs = [refs[base + 2 + stride * i] for i in range(nl)]
  perm_refs = refs[base + stride * nl:base + stride * nl + n_perms]
  out_ref = refs[base + stride * nl + n_perms]
  slabs = refs[base + 1 + stride * nl + n_perms:
               base + 1 + stride * nl + n_perms + nl]
  shifted = refs[base + 1 + stride * nl + n_perms + nl:
                 base + 1 + stride * nl + n_perms + 2 * nl]

  a_scale = a0_ref[pl.program_id(0), 0] if quant else None
  acc_t = jnp.int32 if quant else jnp.float32
  cur = x_ref[0]
  for li, lp in enumerate(plans):
    a_ref = slabs[li]
    g, cl = lp.g, lp.cin
    l_in = lp.p * cl
    pad_l = (lp.k - 1) // 2
    pad_r = lp.k - 1 - pad_l
    rows = height + lp.k - 1
    big_r = rows * g                  # real slab rows (even: height even)

    # --- zero the guard rows: operand reads overrun into them on slots
    # whose weight blocks are zero, and garbage * 0 must stay 0 (NaN/Inf
    # garbage would poison the accumulator).
    a_ref[0:_TOP] = jnp.zeros((_TOP, l_in), cdtype)
    a_ref[_TOP + big_r:] = jnp.zeros((_BOT, l_in), cdtype)

    # --- padded input slab: valid rows + per-layer SAME pad rows
    a_ref[_TOP + pad_l * g:_TOP + (pad_l + height) * g] = cur
    for t in range(pad_l):          # top pad rows (reflect: row -1-t <- 1+t)
      dst = slice(_TOP + (pad_l - 1 - t) * g, _TOP + (pad_l - t) * g)
      if pad_mode == 'zero':
        a_ref[dst] = jnp.zeros((g, l_in), cdtype)
      else:
        src = (t + 1) if pad_mode == 'reflection' else 0
        a_ref[dst] = a_ref[_TOP + (pad_l + src) * g:
                           _TOP + (pad_l + src + 1) * g]
    for t in range(pad_r):          # bottom pad rows (row H+t <- H-2-t)
      dst = slice(_TOP + (pad_l + height + t) * g,
                  _TOP + (pad_l + height + t + 1) * g)
      if pad_mode == 'zero':
        a_ref[dst] = jnp.zeros((g, l_in), cdtype)
      else:
        src = (height - 2 - t) if pad_mode == 'reflection' else height - 1
        a_ref[dst] = a_ref[_TOP + (pad_l + src) * g:
                           _TOP + (pad_l + src + 1) * g]

    # --- shifted slab for P>1: ss[s] = lane-roll(a[s]) by one pixel; the
    # flat one-pixel shift then reads row pairs (s-1, s) with a lane mask.
    if lp.p > 1:
      ss_ref = shifted[li]
      ss_ref[0:_TOP] = jnp.zeros((_TOP, l_in), cdtype)
      ss_ref[_TOP + big_r:] = jnp.zeros((_BOT, l_in), cdtype)
      ss_ref[_TOP:_TOP + big_r] = _lane_roll(a_ref[_TOP:_TOP + big_r], cl)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, l_in), 1)
    gid = jax.lax.broadcasted_iota(jnp.int32, (big_r, 1), 0) % g

    # --- operands o_j[s] = flat-shift-by-one-pixel(a)[s + j], edge-fixed.
    # Fixups are pre-grouped (one fused mask + one permutation matmul per
    # source-row offset — a 128x128 one-hot matmul on the MXU replaces
    # per-slot lane rolls on the VPU); matmuls are emitted immediately
    # after each operand so Mosaic can overlap the next operand's VPU
    # selects with the current operand's MXU work.
    m_rows = height * g
    acc = None
    for j in range(lp.n_ops):
      if lp.p > 1:
        o = jnp.where(lane < cl,
                      ss_ref[_TOP - 1 + j:_TOP - 1 + j + big_r],
                      ss_ref[_TOP + j:_TOP + j + big_r])
      else:
        o = a_ref[_TOP - 1 + j:_TOP - 1 + j + big_r]
      for dg, perm_idx, ents in groups[li][j]:
        mask = None
        for g_mod, sp in ents:
          e = (gid == g_mod) & (lane >= sp * cl) & (lane < (sp + 1) * cl)
          mask = e if mask is None else (mask | e)
        if dg is None:
          val = jnp.zeros_like(o)
        else:
          assert -_TOP <= dg <= _BOT, 'fixup row offset out of guard range'
          val = a_ref[_TOP + dg:_TOP + dg + big_r]
          if perm_idx is not None:
            val = jax.lax.dot_general(
                val, perm_refs[perm_idx][:], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=acc_t).astype(cdtype)
        o = jnp.where(mask, val, o)

      for dy in range(lp.k):
        part = jax.lax.dot_general(
            o[dy * g:dy * g + m_rows],
            w_refs[li][j * lp.k + dy],
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=acc_t)
        acc = part if acc is None else acc + part

    if quant:
      # dequantize: int32 counts -> f32 via act scale x per-channel weight
      # scale, then bias + activation in f32 (exact per-layer semantics)
      acc = acc.astype(jnp.float32) * (s_refs[li][:] * a_scale)
    acc = acc + b_refs[li][:]
    if lp.leakiness is not None:
      acc = jnp.where(acc >= 0, acc, lp.leakiness * acc)

    if li + 1 < nl:
      if quant:   # dynamic per-program requantization for the next layer
        amax = jnp.maximum(jnp.max(jnp.abs(acc)), 1e-8)
        y = jnp.clip(jnp.round(acc * (127.0 / amax)), -127,
                     127).astype(jnp.int8)
        a_scale = amax / 127.0
      else:
        y = acc.astype(cdtype)
      nxt = plans[li + 1]
      if nxt.p != lp.p:   # repack pixel grouping (pure row-major reshape)
        y = y.reshape(height * nxt.g, nxt.p * nxt.cin)
      cur = y
    else:
      out_ref[0] = acc.astype(odtype if quant else cdtype)


def layer_fusable(cin, cout, k, width, height):
  """Whether the Pallas kernel packs this conv efficiently.

  Requires: k in {3,4}; P = ceil(128/Cin) <= 4 (Cin >= 32 — smaller inputs
  waste >= 4x MXU slots and measured slower than XLA); width divisible by
  P with the group count G a multiple of 16 (bf16 tile-aligned vector
  slices); even slab row count (bf16 bitcast lane rolls); output lanes a
  multiple of 128.
  """
  if k not in (3, 4) or height % 2:
    return False
  p = max(1, -(-128 // cin))
  if p > 4 or width % p:
    return False
  g = width // p
  if g % 16 or (p * cout) % 128:
    return False
  if ((height + k - 1) * g) % 2:
    return False
  return True


def _vmem_estimate(layers, width, height, pad_mode, itemsize):
  """Rough per-program VMEM bytes for a fused chain: 2 slab scratches,
  ~4 transient slab-sized vectors per layer (operands, selects, fixups),
  and 2 f32 accumulator-sized values. Used to trim fused suffixes that
  would exceed the compiler's vmem budget (measured OOM: int8 s0 chain at
  512^2 wanted 152M of 128M — the f32 accumulator dominates there)."""
  plans = _plan(layers, width, pad_mode)
  return sum(6 * (height + lp.k - 1) * lp.g * lp.p * lp.cin * itemsize +
             2 * height * lp.g * lp.p * lp.cout * 4
             for lp in plans)


_VMEM_BUDGET = 64 * 1024 * 1024


def _xla_layer(x, layer, pad_mode):
  """One SAME conv + bias + LeakyReLU via XLA (same folded semantics)."""
  from csmri_refinement_tpu.models.layers import same_conv
  k = layer.kernel.shape[0]
  kern = layer.kernel.astype(x.dtype)
  conv = lambda p: jax.lax.conv_general_dilated(
      p, kern, (1, 1), 'VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  y = same_conv(conv, x, k, pad_mode)
  if layer.bias is not None:
    y = y + layer.bias.astype(y.dtype)
  if layer.leakiness is not None:
    y = jnp.where(y >= 0, y, jnp.asarray(layer.leakiness, y.dtype) * y)
  return y


def chain_forward(x, layers: Sequence[ChainLayer], *, pad_mode='reflection',
                  interpret=False, min_cin=64, need_cin=128):
  """Run a conv chain, fusing the longest profitable suffix in one kernel.

  Measured policy (scripts/perf_conv_kernel.py on v5e, NOTES round 3): the
  kernel beats XLA only where MXU packing utilization is high — P=1 layers
  (Cin >= 128, 100% util: 1.57 vs 2.65 ms isolated, chain 3.17 vs 3.82)
  and chains anchored by them (s2 64->128->128: 3.31 vs 3.66). At
  C=32/64 the pixel-packing ceiling (50/67%) plus carry-select VPU work
  loses to XLA's composed conv emitter, so those chains stay XLA: the
  fused suffix takes layers with Cin >= ``min_cin`` and only engages if
  some suffix layer has Cin >= ``need_cin``.

  Layers ahead of the fused suffix run as plain XLA SAME convs on the
  same folded weights. Numerically equivalent to running every layer
  through XLA at the same compute dtype.
  """
  b, h, w, _ = x.shape
  n = len(layers)
  start = n
  for i in range(n - 1, -1, -1):
    kh, kw, cin, cout = layers[i].kernel.shape
    if cin >= min_cin and layer_fusable(cin, cout, kw, w, h):
      start = i
    else:
      break
  if not any(lay.kernel.shape[2] >= need_cin for lay in layers[start:]):
    start = n
  while start < n and _vmem_estimate(layers[start:], w, h, pad_mode,
                                     x.dtype.itemsize) > _VMEM_BUDGET:
    start += 1
  for lay in layers[:start]:
    x = _xla_layer(x, lay, pad_mode)
  if start < n:
    # Mosaic kernels only lower on TPU; CPU (tests, virtual meshes) runs
    # the interpreter, which computes identical results.
    interpret = interpret or jax.default_backend() != 'tpu'
    x = fused_conv_chain(x, layers[start:], pad_mode=pad_mode,
                         interpret=interpret)
  return x


def fused_conv_chain(x, layers: Sequence[ChainLayer], *,
                     pad_mode='reflection', interpret=False,
                     act_scale=None, out_dtype=None):
  """Run a chain of SAME stride-1 convs (+LeakyReLU) as one Pallas kernel.

  x: (B, H, W, Cin) — compute dtype is x.dtype (bf16 on the TPU path).
  Returns (B, H, W, Cout_last) in x.dtype.

  int8 serving mode: pass x already quantized to int8, ``act_scale`` (B,)
  f32 per-element activation scales, per-layer int8 kernels with
  ``w_scale`` set, and ``out_dtype`` for the dequantized output.
  """
  assert pad_mode in ('reflection', 'replication', 'zero')
  b, h, w, cin0 = x.shape
  assert cin0 == layers[0].kernel.shape[2], \
      'input channels do not match first layer'
  for prev, nxt in zip(layers[:-1], layers[1:]):
    assert prev.kernel.shape[3] == nxt.kernel.shape[2], 'chain channel chain'
  cdtype = x.dtype
  quant = cdtype == jnp.int8
  if quant:
    assert act_scale is not None and out_dtype is not None, \
        'int8 mode needs act_scale and out_dtype'
    assert all(l.w_scale is not None for l in layers), \
        'int8 mode needs per-layer w_scale'
  plans = _plan(layers, w, pad_mode)

  flat_in = [x.reshape(b, h * plans[0].g, plans[0].p * cin0)]
  in_specs = [pl.BlockSpec((1, h * plans[0].g, plans[0].p * cin0),
                           lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
  if quant:
    # whole-array SMEM block (per-step blocks fail the (8,128) divisibility
    # check); the kernel indexes it by pl.program_id
    flat_in.append(act_scale.astype(jnp.float32).reshape(b, 1))
    in_specs.append(pl.BlockSpec((b, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM))
  for layer, lp in zip(layers, plans):
    wa = _pack_weights(layer.kernel, lp.p).astype(cdtype)
    bias = layer.bias if layer.bias is not None else \
        jnp.zeros((lp.cout,), jnp.float32)
    ba = jnp.tile(bias.astype(jnp.float32), lp.p)[None, :]
    flat_in += [wa, ba]
    in_specs.append(pl.BlockSpec(wa.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(ba.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    if quant:
      sa = jnp.tile(layer.w_scale.astype(jnp.float32), lp.p)[None, :]
      flat_in.append(sa)
      in_specs.append(pl.BlockSpec(sa.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))

  # Fixup groups; lane-permutation matrices ride as kernel inputs
  # (pallas forbids captured array constants).
  groups = []
  perm_arrays = []
  for lp in plans:
    per_j = []
    for j in range(lp.n_ops):
      lst = []
      for dg, perm, ents in _group_fixups(lp.fixups.get(j, ()),
                                          lp.cin, lp.p * lp.cin):
        if perm is None:
          lst.append((dg, None, tuple(ents)))
        else:
          lst.append((dg, len(perm_arrays), tuple(ents)))
          perm_arrays.append(jnp.asarray(perm).astype(cdtype))
      per_j.append(tuple(lst))
    groups.append(tuple(per_j))
  for pa in perm_arrays:
    flat_in.append(pa)
    in_specs.append(pl.BlockSpec(pa.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))

  g_out, l_out = plans[-1].g, plans[-1].p * plans[-1].cout
  # Slab + shifted-slab scratch per layer (guard/overrun rows: see _TOP/_BOT)
  scratch = [pltpu.VMEM((_TOP + (h + lp.k - 1) * lp.g + _BOT,
                         lp.p * lp.cin), cdtype) for lp in plans]
  scratch += [pltpu.VMEM((_TOP + (h + lp.k - 1) * lp.g + _BOT,
                          lp.p * lp.cin), cdtype) for lp in plans]
  flops = 2 * b * h * w * sum(
      lp.n_ops * lp.k * lp.p * lp.cin * lp.cout for lp in plans)

  kern = functools.partial(_chain_kernel, plans=plans, groups=groups,
                           n_perms=len(perm_arrays), height=h,
                           pad_mode=pad_mode, cdtype=cdtype, quant=quant,
                           odtype=out_dtype)
  out = pl.pallas_call(
      kern,
      out_shape=jax.ShapeDtypeStruct((b, h * g_out, l_out),
                                     out_dtype if quant else cdtype),
      grid=(b,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, h * g_out, l_out), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=scratch,
      cost_estimate=pl.CostEstimate(
          flops=flops,
          bytes_accessed=2 * b * h * w * (cin0 + plans[-1].cout),
          transcendentals=0),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*flat_in)

  return out.reshape(b, h, w, plans[-1].cout)
