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

  kernel: (k, k, Cin, Cout) HWIO (flax layout), any float dtype.
  bias:   (Cout,) or None. BN (eval mode) must already be folded in.
  leakiness: LeakyReLU negative slope, or None for a linear layer.
  """
  kernel: Any
  bias: Optional[Any] = None
  leakiness: Optional[float] = None


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


def _roll(x, shift, axis):
  """pltpu.roll with any-sign shift (result[i] = x[i - shift])."""
  shift %= x.shape[axis]
  return x if shift == 0 else pltpu.roll(x, shift, axis=axis)


def _chain_kernel(*refs, plans, height, pad_mode, cdtype):
  """refs: x_ref, (w_ref, b_ref) per layer, out_ref, then scratch per layer."""
  nl = len(plans)
  x_ref = refs[0]
  w_refs = [refs[1 + 2 * i] for i in range(nl)]
  b_refs = [refs[2 + 2 * i] for i in range(nl)]
  out_ref = refs[1 + 2 * nl]
  scratch = refs[2 + 2 * nl:2 + 3 * nl]

  cur = x_ref[0]
  for li, lp in enumerate(plans):
    a_ref = scratch[li]
    g, cl = lp.g, lp.cin
    l_in = lp.p * cl
    pad_l = (lp.k - 1) // 2
    pad_r = lp.k - 1 - pad_l

    # --- padded input slab: valid rows + per-layer SAME pad rows
    a_ref[pad_l * g:(pad_l + height) * g] = cur
    for t in range(pad_l):          # top pad rows (reflect: row -1-t <- 1+t)
      dst = slice((pad_l - 1 - t) * g, (pad_l - t) * g)
      if pad_mode == 'zero':
        a_ref[dst] = jnp.zeros((g, l_in), cdtype)
      else:
        src = (t + 1) if pad_mode == 'reflection' else 0
        a_ref[dst] = a_ref[(pad_l + src) * g:(pad_l + src + 1) * g]
    for t in range(pad_r):          # bottom pad rows (row H+t <- H-2-t)
      dst = slice((pad_l + height + t) * g, (pad_l + height + t + 1) * g)
      if pad_mode == 'zero':
        a_ref[dst] = jnp.zeros((g, l_in), cdtype)
      else:
        src = (height - 2 - t) if pad_mode == 'reflection' else height - 1
        a_ref[dst] = a_ref[(pad_l + src) * g:(pad_l + src + 1) * g]

    a = a_ref[:]
    rows = height + lp.k - 1

    # --- S = flat shift right by one pixel (lane roll + sublane carry)
    if lp.p > 1:
      roll_p = _roll(a, cl, 1)                   # [g, l] = a[g, l - cl]
      carry = _roll(roll_p, 1, 0)                # previous group's last px
      lane = jax.lax.broadcasted_iota(jnp.int32, (1, l_in), 1)
      s_op = jnp.where(lane < cl, carry, roll_p)
    else:
      lane = jax.lax.broadcasted_iota(jnp.int32, (1, l_in), 1)
      s_op = _roll(a, 1, 0)                      # pure sublane shift
    gid = jax.lax.broadcasted_iota(jnp.int32, (rows * g, 1), 0) % g

    def edge_value(dg, dl):
      v = a
      if dl:
        v = _roll(v, -dl * cl, 1)                # [g, l] = a[g, l + dl*cl]
      if dg:
        v = _roll(v, -dg, 0)                     # [g, l] = a[g + dg, l]
      return v

    ops = []
    for j in range(lp.n_ops):
      o = s_op if j == 0 else _roll(s_op, -j, 0)
      for (g_mod, sp, dg, dl) in lp.fixups.get(j, ()):
        m = (gid == g_mod) & (lane >= sp * cl) & (lane < (sp + 1) * cl)
        o = jnp.where(m, jnp.zeros_like(o) if dg is None
                      else edge_value(dg, dl), o)
      ops.append(o)

    # --- matmuls: acc[m, P*Cout] = sum_j,dy O_j[dy*G:dy*G+H*G] @ W[j*k+dy]
    m_rows = height * g
    acc = None
    for j in range(lp.n_ops):
      for dy in range(lp.k):
        part = jax.lax.dot_general(
            ops[j][dy * g:dy * g + m_rows],
            w_refs[li][j * lp.k + dy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    acc = acc + b_refs[li][:]
    if lp.leakiness is not None:
      acc = jnp.where(acc >= 0, acc, lp.leakiness * acc)
    y = acc.astype(cdtype)

    if li + 1 < nl:
      nxt = plans[li + 1]
      if nxt.p != lp.p:   # repack pixel grouping (pure row-major reshape)
        y = y.reshape(height * nxt.g, nxt.p * nxt.cin)
      cur = y
    else:
      out_ref[0] = y


def fused_conv_chain(x, layers: Sequence[ChainLayer], *,
                     pad_mode='reflection', interpret=False):
  """Run a chain of SAME stride-1 convs (+LeakyReLU) as one Pallas kernel.

  x: (B, H, W, Cin) — compute dtype is x.dtype (bf16 on the TPU path).
  Returns (B, H, W, Cout_last) in x.dtype.
  """
  assert pad_mode in ('reflection', 'replication', 'zero')
  b, h, w, cin0 = x.shape
  assert cin0 == layers[0].kernel.shape[2], \
      'input channels do not match first layer'
  for prev, nxt in zip(layers[:-1], layers[1:]):
    assert prev.kernel.shape[3] == nxt.kernel.shape[2], 'chain channel chain'
  cdtype = x.dtype
  plans = _plan(layers, w, pad_mode)

  flat_in = [x.reshape(b, h * plans[0].g, plans[0].p * cin0)]
  in_specs = [pl.BlockSpec((1, h * plans[0].g, plans[0].p * cin0),
                           lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
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

  g_out, l_out = plans[-1].g, plans[-1].p * plans[-1].cout
  scratch = [pltpu.VMEM(((h + lp.k - 1) * lp.g, lp.p * lp.cin), cdtype)
             for lp in plans]
  flops = 2 * b * h * w * sum(
      lp.n_ops * lp.k * lp.p * lp.cin * lp.cout for lp in plans)

  kern = functools.partial(_chain_kernel, plans=plans, height=h,
                           pad_mode=pad_mode, cdtype=cdtype)
  out = pl.pallas_call(
      kern,
      out_shape=jax.ShapeDtypeStruct((b, h * g_out, l_out), cdtype),
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
