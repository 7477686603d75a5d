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


_CYCLE_SCRIPT = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax, jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from noize_tpu.parallel import distributed as D

    rank = int(sys.argv[1])
    coord = sys.argv[2]
    assert D.initialize(coord, num_processes=2, process_id=rank)
    assert jax.device_count() == 4

    from noize_tpu.core.tiles import TileSetMeta
    from noize_tpu.erosion.params import ErosionSettings
    from noize_tpu.erosion.sim import SimState, erosion_cycle, init_state
    from noize_tpu.erosion.world import WorldState
    from noize_tpu.parallel import device_mesh as DM
    from noize_tpu.parallel.sharded_erosion import sharded_erosion_cycle

    res = 32
    rng = np.random.default_rng(6)
    h = rng.uniform(0.2, 0.8, (res, res)).astype(np.float32)
    settings = ErosionSettings(PARTICLES_PER_CYCLE=48, MAXAGE=12,
                               WATER_STEPS=3, CYCLES=1, PILING_RADIUS=4)
    meta = TileSetMeta(tile_res=res, tile_size=res, generator_res=res,
                       height=500, margin=0)

    # single-device reference, computed process-locally on every rank
    want = erosion_cycle(
        init_state(jnp.asarray(h), jax.random.PRNGKey(9)), settings, meta)

    # ONE global field sharded over a 2x2 mesh whose x axis spans the
    # process boundary: descent chunk halo exchange, event halo folds, the
    # particle psum merge, and the exact global drain top-K all cross it
    mesh = DM.spatial_mesh()
    sh = DM.field_sharding(mesh)
    rep = NamedSharding(mesh, P())
    mk = lambda a: jax.make_array_from_callback(
        a.shape, sh, lambda idx: a[idx])
    z = np.zeros((res, res), np.float32)
    key = np.asarray(jax.random.PRNGKey(9))
    state = SimState(
        world=WorldState(height=mk(h), pool=mk(z), flow=mk(z),
                         track=mk(z), plants=mk(z)),
        drain_water=mk(z),
        key=jax.make_array_from_callback(key.shape, rep,
                                         lambda idx: key[idx]),
    )
    got = sharded_erosion_cycle(mesh, state, settings, meta, chunk=4)

    # every locally-addressable shard must match the single-device result
    for name in ("height", "pool", "flow", "track"):
        g = getattr(got.world, name)
        w = np.asarray(getattr(want.world, name))
        assert g.addressable_shards, name
        for s in g.addressable_shards:
            np.testing.assert_allclose(
                np.asarray(s.data), w[s.index], atol=2e-6,
                err_msg=f"rank {rank} {name}")
    gk = np.asarray(got.key.addressable_shards[0].data)
    assert np.array_equal(gk, np.asarray(want.key)), "key stream diverged"
    print(f"RANK{rank}_CYCLE_OK", flush=True)
    """
)


_CKPT_SCRIPT = textwrap.dedent(
    """
    import os, sys
    import numpy as np
    import jax, jax.numpy as jnp

    from noize_tpu.parallel import distributed as D

    rank = int(sys.argv[1])
    coord = sys.argv[2]
    savedir = sys.argv[3]
    assert D.initialize(coord, num_processes=2, process_id=rank)

    from noize_tpu.core.store import PipelineStateManager
    from noize_tpu.erosion.params import ErosionSettings
    from noize_tpu.parallel import device_mesh as DM
    from noize_tpu.parallel.sharded_erosion import ShardedErosionSim

    rng = np.random.default_rng(23)
    h = rng.uniform(0.2, 0.8, (32, 32)).astype(np.float32)
    es = ErosionSettings(PARTICLES_PER_CYCLE=16, MAXAGE=4, WATER_STEPS=2,
                         CYCLES=1, PILING_RADIUS=4)
    mesh = DM.spatial_mesh()
    sm = PipelineStateManager(savedir, "dist", "1")
    sim = ShardedErosionSim(mesh, h, settings=es, chunk=4, state_manager=sm)
    sim.step(1)
    # each process saves only ITS addressable blocks — no cross-host gather
    sim.save_erosion_state()
    want = {
        name: [(s.index, np.asarray(s.data))
               for s in getattr(sim.state.world, name).addressable_shards]
        for name in ("height", "pool", "flow", "track", "plants")
    }
    want["drain_water"] = [(s.index, np.asarray(s.data))
                           for s in sim.state.drain_water.addressable_shards]

    # a FRESH sim on the same topology resumes bit-exact from local files
    sim2 = ShardedErosionSim(mesh, np.zeros_like(h), settings=es, chunk=4,
                             state_manager=PipelineStateManager(
                                 savedir, "dist", "1"))
    sim2.restore_erosion_state()
    for name, shards in want.items():
        arr = (sim2.state.drain_water if name == "drain_water"
               else getattr(sim2.state.world, name))
        by_idx = {tuple((s.start, s.stop) for s in i): d
                  for i, d in ((sh.index, np.asarray(sh.data))
                               for sh in arr.addressable_shards)}
        for idx, data in shards:
            key = tuple((s.start, s.stop) for s in idx)
            np.testing.assert_array_equal(by_idx[key], data,
                                          err_msg=f"rank {rank} {name}")
    # ...and it keeps simulating (check local shards: the global array is
    # not fully addressable on either process)
    sim2.step(1)
    for s in sim2.height_map.addressable_shards:
        assert np.isfinite(np.asarray(s.data)).all()
    print(f"RANK{rank}_CKPT_OK", flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_ranks(tmp_path, script_body, ok_token, timeout=240,
                   extra_args=()):
    script = tmp_path / "rank.py"
    script.write_text(script_body)
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
            [sys.executable, str(script), str(rank), coord,
             *map(str, extra_args)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert ok_token.format(rank=rank) in out


def test_two_process_psum_and_tiles(tmp_path):
    _run_two_ranks(tmp_path, _RANK_SCRIPT, "RANK{rank}_OK")


def test_two_process_sharded_erosion_cycle(tmp_path):
    """The FULL sharded erosion cycle on one field spanning a real process
    boundary (TPU pods keep ICI across hosts within a slice — one world
    across hosts IS the production scale-out): chunked descent halos, the
    masked particle psum merge, event halo folds, and the exact global
    drain top-K all cross the boundary and must reproduce the
    single-device cycle within the documented D8 tolerance."""
    _run_two_ranks(tmp_path, _CYCLE_SCRIPT, "RANK{rank}_CYCLE_OK",
                   timeout=600)


def test_two_process_sharded_checkpoint_resume(tmp_path):
    """Multi-host checkpoint/resume: each process saves only its
    addressable shard blocks (parallel.sharded_checkpoint — no cross-host
    gather), and a fresh sim on the same topology restores bit-exact from
    its local files and keeps simulating."""
    savedir = tmp_path / "saves"
    savedir.mkdir()
    _run_two_ranks(tmp_path, _CKPT_SCRIPT, "RANK{rank}_CKPT_OK",
                   timeout=600, extra_args=(str(savedir),))
