"""Serving export: freeze an inference network into a jax.export artifact.

The reference's deployment funnel ends at a stripped torch checkpoint
(/root/reference/utils/deploy_checkpoint.py:23-33) — serving still needs
the exact model code and framework version. This module adds the next
step, with no reference equivalent: the deployed network (weights AND
forward graph) is serialized to ONE self-contained StableHLO artifact via
``jax.export``. The file replays on any JAX runtime whose calling
convention is compatible, without this package's model code, and a single
artifact is lowered for multiple platforms (cpu + tpu by default) so the
same file verifies on a CPU host and serves on TPU.

Design notes (TPU-first):

* Weights are baked into the artifact as StableHLO constants — the models
  here are a few MB, and a self-contained file is the right serving unit.
* Shapes are static (one artifact per (batch, resolution) serving point):
  XLA:TPU compiles static shapes onto the MXU; symbolic batch dims would
  trade that for retrace-per-shape anyway.
* One trace must be valid on EVERY target platform, so the export scope
  pins the platform-neutral GEMM DC lowering (``ops.dc.force_gemm`` — no
  complex dot_general, no FFT HLO, no Pallas custom call).

Artifact container (single file)::

    magic     b"CSMRI-SHLO-1\\n"
    4 bytes   big-endian header length
    header    UTF-8 JSON: input keys/shapes/dtypes, platforms, metadata
    payload   jax.export serialization (StableHLO + calling convention)
"""

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

MAGIC = b'CSMRI-SHLO-1\n'


def export_predict(runner, host_batch, platforms=('cpu', 'tpu')):
  """Freeze ``runner``'s restored inference network at ``host_batch``'s
  shapes.

  ``host_batch`` is a raw loader batch (e.g. ``{'gt', 'index'}``); the
  runner's batch preparer builds the model input batch from it, which
  fixes the exported input signature to the model's input keys (the
  artifact consumes prepared batches — data prep stays in the pipeline,
  the artifact is the network).

  Returns ``(jax.export.Exported, header dict)``.
  """
  from csmri_refinement_tpu.ops import dc

  batch = runner.preparer.prepare_val(host_batch)
  runner._ensure_initialized(batch)
  fn, state, input_keys = runner.export_predict_parts()
  feed = {k: jnp.asarray(batch[k]) for k in input_keys}

  dc.force_gemm(True)
  try:
    exported = jax_export.export(
        jax.jit(lambda b: fn(state, b)),
        platforms=tuple(platforms))(feed)
  finally:
    dc.force_gemm(False)

  header = {
      'format': 1,
      'platforms': list(exported.platforms),
      'input_keys': list(input_keys),
      'input_shapes': {k: list(v.shape) for k, v in feed.items()},
      'input_dtypes': {k: str(v.dtype) for k, v in feed.items()},
      'jax_version': jax.__version__,
  }
  return exported, header


def save_artifact(path, exported, header, extra_meta=None):
  """Write the single-file artifact container (see module docstring)."""
  header = dict(header)
  if extra_meta:
    header['meta'] = extra_meta
  payload = exported.serialize()
  header['payload_bytes'] = len(payload)
  blob = json.dumps(header, sort_keys=True).encode('utf-8')
  with open(path, 'wb') as f:
    f.write(MAGIC)
    f.write(struct.pack('>I', len(blob)))
    f.write(blob)
    f.write(payload)


def load_artifact(path):
  """Read an artifact container → ``(jax.export.Exported, header dict)``."""
  with open(path, 'rb') as f:
    magic = f.read(len(MAGIC))
    if magic != MAGIC:
      raise ValueError('{}: not a csmri serving artifact (bad magic '
                       '{!r})'.format(path, magic))
    (hlen,) = struct.unpack('>I', f.read(4))
    header = json.loads(f.read(hlen).decode('utf-8'))
    payload = f.read()
  if header.get('payload_bytes') not in (None, len(payload)):
    raise ValueError('{}: truncated artifact ({} payload bytes, header '
                     'says {})'.format(path, len(payload),
                                       header['payload_bytes']))
  return jax_export.deserialize(payload), header


def load_callable(path, jit=True):
  """Load an artifact as ``fn(batch dict) -> model outputs``.

  ``jit=True`` wraps the replay in ``jax.jit`` — REQUIRED on the tunneled
  TPU backend (no eager dispatch) and free elsewhere. Extra batch keys
  (targets, indices) are ignored; missing input keys raise KeyError.
  """
  exported, header = load_artifact(path)
  keys = header['input_keys']
  call_fn = jax.jit(exported.call) if jit else exported.call

  def call(batch):
    return call_fn({k: jnp.asarray(batch[k]) for k in keys})

  return call, header


def verify_artifact(path, runner, host_batch):
  """Replay the artifact against ``runner.predict`` on one batch; returns
  the max abs difference over all output leaves."""
  call, _ = load_callable(path)
  batch = runner.preparer.prepare_val(host_batch)
  want = runner.predict(batch)
  got = call(batch)
  diffs = jax.tree_util.tree_map(
      lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                       - np.asarray(b, np.float32)))),
      want, got)
  return max(jax.tree_util.tree_leaves(diffs))
