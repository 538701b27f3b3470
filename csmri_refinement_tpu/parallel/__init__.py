"""Multi-device scaling: mesh + sharding configuration.

Replaces the reference's single-node ``nn.DataParallel``
(/root/reference/utils/__init__.py:59-68, utils/custom_data_parallel.py):
instead of replicate/scatter/gather Python machinery, a
``jax.sharding.Mesh`` is declared once, parameters are replicated, batches
are sharded over the ``data`` axis, and GSPMD inserts the gradient
all-reduce over ICI. Models returning dicts need no special handling (the
reason CustomDataParallel existed) — dicts are pytrees.

Config surface::

    "mesh": {"data": -1}     # data-parallel over all visible devices

The reference's multi-GPU trigger (``--cuda '2,3'``) maps to running under
more devices and keeping the default mesh.

Multi-host/multi-process: the same mesh spans all processes' devices once
``parallel.distributed.initialize`` has run (config ``distributed`` section
or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env). Each
process feeds its local batch slice (``DataLoader(process_shard=...)``);
``shard_batch`` assembles the global array and the jitted steps are
ordinary SPMD — integration-tested on a 2-process CPU cluster with gloo
collectives (tests/test_distributed.py).
"""

from csmri_refinement_tpu.parallel.mesh import (  # noqa: F401
    gather_to_replicated, make_mesh, mesh_from_conf, multiprocess,
    replicate, shard_batch, shard_stacked_batch)
