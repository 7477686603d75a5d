"""Two-process jax.distributed validation on the CPU backend.

parallel.distributed is written for multi-host DCN deployment; everything
else in tests/ exercises it single-process.  This test launches two REAL
processes, initializes the distributed runtime through
noize_tpu.parallel.distributed.initialize, builds the multihost tile mesh,
and runs a psum across the process boundary plus a sharded fractal tile
per host — validating the cross-host wiring end to end without TPU pods.

Reference capability row: SURVEY.md §2.7 "distributed communication
backend" (the reference is single-process shared-memory; multi-host is
where the TPU design goes beyond it).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_RANK_SCRIPT = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax, jax.numpy as jnp

    from noize_tpu.parallel import distributed as D

    rank = int(sys.argv[1])
    coord = sys.argv[2]
    assert D.initialize(coord, num_processes=2, process_id=rank)
    assert jax.process_count() == 2
    assert D.is_primary() == (rank == 0)

    mesh = D.multihost_tile_mesh()
    assert mesh.devices.shape[0] == 2  # host axis spans the processes

    # cross-process collective: psum of (rank+1) over every device
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = jax.device_count()
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(("host", "batch"))),
        np.full((jax.local_device_count(),), rank + 1, np.float32),
        (n,),
    )
    from jax import shard_map
    total = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, ("host", "batch")),
        mesh=mesh,
        in_specs=P(("host", "batch")),
        out_specs=P(),
    ))(arr)
    got = float(np.asarray(jax.device_get(
        total.addressable_shards[0].data)))
    nl = jax.local_device_count()
    want = float(nl * 1 + nl * 2)
    assert got == want, (got, want)

    # per-host independent tile: each process generates its own fractal
    from noize_tpu.ops.fractal import fractal
    tile = fractal(64, 128 * rank, 0, noise_type="Perlin", octaves=3)
    assert bool(jnp.isfinite(tile).all())
    print(f"RANK{rank}_OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_and_tiles(tmp_path):
    script = tmp_path / "rank.py"
    script.write_text(_RANK_SCRIPT)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}_OK" in out
