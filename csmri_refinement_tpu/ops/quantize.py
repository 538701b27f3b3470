"""int8 quantized inference — explicit OPT-IN serving mode.

Quantizes the U-Net conv chains (weights per-output-channel symmetric
int8, activations dynamically per batch element) and runs them through the
fused Pallas chain kernel (ops/conv_pallas.py) with int32 MXU accumulation
and exact f32 per-layer epilogues (dequant + bias + LeakyReLU + requant).

THIS MODE SITS OUTSIDE THE 0.1 dB DEFAULT QUALITY BUDGET by policy,
though the measured cost on a trained checkpoint is small (-0.016 dB /
-0.0003 SSIM at 256², NOTES round-3 quality-vs-dtype table). Nothing
enables it by default: it is reachable only through
``UNET(quantize_inference=True)`` / the ``quantize_inference`` config key /
``bench.py --dtype int8``.

Rebuilds nothing from the reference (which has no quantized path). int8 is
NOT faster on this stack: a 4096³ s8×s8→s32 matmul measures 158 TOPS vs
209 TFLOPS bf16 (0.76×) on this libtpu — the datasheet's 2× int8 path is
not what dot_general emits here (NOTES round 3,
scripts/probe_int8_prims.py). The mode's value is halved HBM traffic for
chain intermediates plus the quality-vs-dtype evidence table, not MXU
speed.
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from csmri_refinement_tpu.ops import conv_pallas


# Trace-time (n_layers, n_quantized) per chain_forward_int8 call; tooling
# resets it, traces a model, and checks fell_back_to_bf16().
_TRACE_LOG = []


def reset_trace_log():
  _TRACE_LOG.clear()


def fell_back_to_bf16():
  """True if any chain traced since reset_trace_log() ran 0 quantized
  layers (VMEM-budget trim, ops/conv_pallas._VMEM_BUDGET)."""
  return any(q == 0 for _, q in _TRACE_LOG)


def quantize_weight(w):
  """Per-output-channel symmetric int8 quantization of an HWIO kernel.

  Returns (w_int8, scale) with w ~= w_int8 * scale[None, None, None, :].
  """
  amax = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12)
  scale = amax / 127.0
  wi = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
  return wi, scale.astype(jnp.float32)


def quantize_act(x):
  """Dynamic per-batch-element symmetric int8 activation quantization."""
  amax = jnp.maximum(
      jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3)), 1e-12)
  scale = amax / 127.0
  xi = jnp.clip(jnp.round(x.astype(jnp.float32)
                          / scale[:, None, None, None]),
                -127, 127).astype(jnp.int8)
  return xi, scale


def quantize_chain(layers: Sequence[conv_pallas.ChainLayer]):
  """Quantize a folded conv chain's weights (bias/leakiness unchanged —
  epilogues stay f32-exact)."""
  out = []
  for lay in layers:
    wi, ws = quantize_weight(lay.kernel.astype(jnp.float32))
    out.append(conv_pallas.ChainLayer(wi, lay.bias, lay.leakiness, ws))
  return out


def chain_forward_int8(x, layers, *, pad_mode='reflection',
                       interpret=False):
  """int8 serving-mode counterpart of conv_pallas.chain_forward.

  The longest kernel-eligible suffix runs quantized in one fused Pallas
  kernel; ineligible prefix layers (e.g. the 2->32 stem) stay in the model
  compute dtype via XLA — quantizing them would cost accuracy for
  negligible speed (they are a tiny fraction of the FLOPs).
  """
  b, h, w, _ = x.shape
  n = len(layers)
  start = n
  for i in range(n - 1, -1, -1):
    kh, kw, cin, cout = layers[i].kernel.shape
    if conv_pallas.layer_fusable(cin, cout, kw, w, h):
      start = i
    else:
      break
  while start < n and conv_pallas._vmem_estimate(
      layers[start:], w, h, pad_mode, 1) > conv_pallas._VMEM_BUDGET:
    start += 1
  # Trace-time record so quality tooling can label rows where the
  # quantized chain was trimmed back to the bf16 XLA path (VMEM budget) —
  # those rows are fallback-correctness records, not int8 measurements.
  _TRACE_LOG.append((n, n - start))
  for lay in layers[:start]:
    x = conv_pallas._xla_layer(x, lay, pad_mode)
  if start < n:
    out_dtype = x.dtype
    xi, a_scale = quantize_act(x)
    qlayers = quantize_chain(layers[start:])
    interpret = interpret or jax.default_backend() != 'tpu'
    x = conv_pallas.fused_conv_chain(
        xi, qlayers, pad_mode=pad_mode, interpret=interpret,
        act_scale=a_scale, out_dtype=out_dtype)
  return x
