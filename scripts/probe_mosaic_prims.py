#!/usr/bin/env python
"""Empirical probe: which Mosaic primitives work on bf16 on this libtpu.

Each probe compiles + runs a tiny Pallas kernel and checks numerics vs the
XLA reference. Drives the conv_pallas.py redesign (the original kernel hit
'not implemented: Rotate with non-32-bit data' on bf16 lane rolls).

    python scripts/probe_mosaic_prims.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 256, 128
DT = jnp.bfloat16


def run(name, kernel, ref_fn, in_shape=(R, L), out_shape=(R, L)):
  x = jnp.arange(np.prod(in_shape), dtype=jnp.float32) \
      .reshape(in_shape).astype(DT) * 1e-3
  try:
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = ref_fn(x.astype(jnp.float32))
    got = np.asarray(y.astype(jnp.float32))
    ok = np.allclose(got, np.asarray(want), atol=1e-6)
    print('{:34s} {}'.format(name, 'OK' if ok else 'WRONG NUMERICS'), flush=True)
  except Exception as e:
    msg = str(e).split('\n')[0][:110]
    print('{:34s} FAIL: {}'.format(name, msg), flush=True)


def main():
  print('backend:', jax.default_backend(), flush=True)

  def lane_roll_direct(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 32, axis=1)
  run('lane roll bf16 direct',
      lane_roll_direct, lambda x: jnp.roll(x, 32, axis=1))

  def lane_roll_bitcast(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[:], jnp.int32)
    v = pltpu.roll(v, 32, axis=1)
    o_ref[:] = pltpu.bitcast(v, DT)
  run('lane roll bf16 via i32 bitcast',
      lane_roll_bitcast, lambda x: jnp.roll(x, 32, axis=1))

  def sublane_roll_direct(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 1, axis=0)
  run('sublane roll bf16 direct',
      sublane_roll_direct, lambda x: jnp.roll(x, 1, axis=0))

  def unaligned_read(x_ref, o_ref):
    o_ref[:] = x_ref[1:R - 15]
  run('unaligned sublane ref read',
      unaligned_read, lambda x: x[1:R - 15], (R, L), (R - 16, L))

  def unaligned_write(x_ref, o_ref):
    o_ref[:] = jnp.zeros((R, L), DT)
    o_ref[1:R - 15] = x_ref[0:R - 16]
  run('unaligned sublane ref write',
      unaligned_write,
      lambda x: jnp.pad(x[:R - 16], ((1, 15), (0, 0))), (R, L), (R, L))

  def select_iota(x_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    o_ref[:] = jnp.where(lane < 32, x_ref[:] * 2, x_ref[:])
  run('bf16 where(iota) select',
      select_iota,
      lambda x: jnp.where(jnp.arange(L)[None] < 32, x * 2, x))

  def mid_dim_slice(x_ref, o_ref):
    o_ref[:] = x_ref[:, 3, :]
  run('strided mid-dim ref read',
      mid_dim_slice, lambda x: x[:, 3, :], (64, 8, L), (64, L))

  def scratch_chain(x_ref, o_ref, s_ref):
    s_ref[8:8 + R] = x_ref[:]
    s_ref[0:8] = s_ref[8:16]
    o_ref[:] = s_ref[1:1 + R] * 2
  try:
    x = jnp.arange(R * L, dtype=jnp.float32).reshape(R, L).astype(DT) * 1e-3
    y = pl.pallas_call(
        scratch_chain,
        out_shape=jax.ShapeDtypeStruct((R, L), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R + 16, L), DT)],
    )(x)
    xf = np.asarray(x.astype(jnp.float32))
    s = np.zeros((R + 16, L), np.float32)
    s[8:8 + R] = xf
    s[0:8] = s[8:16]
    want = s[1:1 + R] * 2
    got = np.asarray(y.astype(jnp.float32))
    ok = np.allclose(got, want, atol=1e-6)
    print('{:34s} {}'.format('scratch write+unaligned read',
                             'OK' if ok else 'WRONG NUMERICS'), flush=True)
  except Exception as e:
    print('{:34s} FAIL: {}'.format('scratch write+unaligned read',
                                   str(e).split('\n')[0][:110]), flush=True)

  def lane_roll_bitcast_odd_rows(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[:], jnp.int32)
    v = pltpu.roll(v, 64, axis=1)
    o_ref[:] = pltpu.bitcast(v, DT)
  run('bitcast roll on 250-row slab',
      lane_roll_bitcast_odd_rows, lambda x: jnp.roll(x, 64, axis=1),
      (250, L), (250, L))


if __name__ == '__main__':
  try:
    main()
  except Exception:
    traceback.print_exc()
