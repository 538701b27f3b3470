#!/usr/bin/env python
"""Empirical probe: int8 Mosaic primitives for the quantized serving mode.

Checks whether this libtpu accepts, inside one Pallas kernel: s8 x s8 ->
s32 dot_general, int8 lane rolls via i32 bitcast, int8 selects, and
f32 -> int8 round/clip requantization. Also times s8 vs bf16 matmul
throughput.

    python scripts/probe_int8_prims.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 256, 128


def run(name, kernel, ref_fn, inputs, out_shape, out_dtype):
  try:
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*inputs)
    want = ref_fn(*inputs)
    got = np.asarray(y.astype(jnp.float32))
    ok = np.allclose(got, np.asarray(want.astype(jnp.float32)), atol=1e-5)
    print('{:34s} {}'.format(name, 'OK' if ok else 'WRONG NUMERICS'),
          flush=True)
    return ok
  except Exception as e:
    print('{:34s} FAIL: {}'.format(name, str(e).split('\n')[0][:110]),
          flush=True)
    return False


def main():
  print('backend:', jax.default_backend(), flush=True)
  rng = np.random.RandomState(0)
  xi = jnp.asarray(rng.randint(-127, 128, (R, L)), jnp.int8)
  wi = jnp.asarray(rng.randint(-127, 128, (L, L)), jnp.int8)

  def mm(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
  run('s8 x s8 -> s32 dot_general', mm,
      lambda x, w: jax.lax.dot_general(
          x.astype(jnp.int32), w.astype(jnp.int32),
          (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32),
      [xi, wi], (R, L), jnp.int32)

  def roll8(x_ref, o_ref):
    v = pltpu.bitcast(x_ref[:], jnp.int32)
    v = pltpu.roll(v, 32, axis=1)
    o_ref[:] = pltpu.bitcast(v, jnp.int8)
  run('int8 lane roll via i32 bitcast', roll8,
      lambda x: jnp.roll(x, 32, axis=1), [xi], (R, L), jnp.int8)

  def sel8(x_ref, o_ref):
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    o_ref[:] = jnp.where(lane < 32, x_ref[:],
                         jnp.zeros_like(x_ref[:]))
  run('int8 where(iota) select', sel8,
      lambda x: jnp.where(jnp.arange(L)[None] < 32, x, 0),
      [xi], (R, L), jnp.int8)

  xf = jnp.asarray(rng.randn(R, L).astype(np.float32) * 3)

  def requant(x_ref, o_ref):
    v = x_ref[:]
    amax = jnp.max(jnp.abs(v))
    s = 127.0 / jnp.maximum(amax, 1e-8)
    o_ref[:] = jnp.clip(jnp.round(v * s), -127, 127).astype(jnp.int8)
  def requant_ref(x):
    s = 127.0 / np.maximum(np.max(np.abs(np.asarray(x))), 1e-8)
    return jnp.asarray(np.clip(np.round(np.asarray(x) * s), -127, 127),
                       jnp.int8)
  run('f32 -> int8 dynamic requant', requant, requant_ref,
      [xf], (R, L), jnp.int8)

  def deq(x_ref, w_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * 0.01
  run('s8 matmul + f32 dequant', deq,
      lambda x, w: jax.lax.dot_general(
          x.astype(jnp.int32), w.astype(jnp.int32), (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.int32).astype(jnp.float32) * 0.01,
      [xi, wi], (R, L), jnp.float32)

  # throughput: big s8 matmul chain vs bf16
  from csmri_refinement_tpu.utils.profiling import timed_scan
  n = 4096
  a8 = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
  b8 = jnp.asarray(rng.randint(-127, 128, (n, n)), jnp.int8)
  try:
    def mm8(a, b):
      y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
      return (y >> 8).astype(jnp.int8)
    secs = timed_scan(mm8, a8, args=(b8,))
    print('s8 4096^3 matmul: {:.2f} ms = {:.0f} TOPS'.format(
        secs * 1e3, 2 * n ** 3 / secs / 1e12), flush=True)
  except Exception as e:
    print('s8 matmul timing FAIL:', str(e).split('\n')[0][:110], flush=True)
  abf = a8.astype(jnp.bfloat16)
  bbf = b8.astype(jnp.bfloat16)
  def mmb(a, b):
    y = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y * 1e-4).astype(jnp.bfloat16)
  secs = timed_scan(mmb, abf, args=(bbf,))
  print('bf16 4096^3 matmul: {:.2f} ms = {:.0f} TFLOPS'.format(
      secs * 1e3, 2 * n ** 3 / secs / 1e12), flush=True)


if __name__ == '__main__':
  main()
