"""Composition fuzz: random stage chains must agree between the driver
path (Pipeline.run, one stage at a time) and the fused single-jit path
(compose.fuse) — the two executions of the same stage list the framework
promises are interchangeable (pipeline/compose.py).

Agreement is to a few ulp, not bit-exact: the fused program lets XLA
fuse ACROSS stage boundaries, which reassociates f32 arithmetic
differently than per-stage execution (measured max ~3e-7 relative).
The asserted tolerance (1e-5) is 10× under the framework's documented
1e-4 numeric contract (BASELINE.md).  BINARIZE is excluded on purpose —
thresholding turns ulp noise into 0-vs-1 flips by construction.

Seeded and deterministic; failures print the generating chain.
"""

import numpy as np
import pytest

from noize_tpu.core.stageio import GeneratorData
from noize_tpu.ops.kernels import KERNEL_FILTER_TYPES
from noize_tpu.pipeline import stages as S
from noize_tpu.pipeline.compose import fuse
from noize_tpu.pipeline.driver import Pipeline

RES = 64

NOISE_TYPES = ("Perlin", "Simplex", "RotatedSimplex", "Cellular")


def _random_chain(rng):
    chain = [S.NoiseStage(
        noiseType=NOISE_TYPES[rng.integers(len(NOISE_TYPES))],
        octaves=int(rng.integers(1, 6)),
        hurst=float(rng.uniform(0.1, 0.9)),
        noiseSize=float(rng.uniform(100, 2000)),
    )]
    n_filters = int(rng.integers(1, 5))
    for _ in range(n_filters):
        kind = rng.integers(5)
        if kind == 0:
            chain.append(S.KernelFilterStage(
                filter=KERNEL_FILTER_TYPES[
                    rng.integers(len(KERNEL_FILTER_TYPES))],
                iterations=int(rng.integers(1, 4))))
        elif kind == 1:
            chain.append(S.StageSmoothBlur(width=3,
                                           iterations=int(rng.integers(1, 4))))
        elif kind == 2:
            chain.append(S.StageGaussianBlur(
                sigma="s1d00", width=5, iterations=int(rng.integers(1, 6))))
        elif kind == 3:
            chain.append(S.ConstantStage(
                operation="MULTIPLY", value=float(rng.uniform(0.2, 0.9))))
        else:
            chain.append(S.StageThermalErosion(
                iterations=int(rng.integers(1, 3)),
                talus=int(rng.integers(30, 60))))
    return chain


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_fused_matches_driver(seed):
    rng = np.random.default_rng(seed)
    chain = _random_chain(rng)
    xpos, zpos = int(rng.integers(0, 50)), int(rng.integers(0, 50))

    driver_out = Pipeline(list(chain)).run(
        GeneratorData(uuid=f"fz{seed}", resolution=RES, xpos=xpos, zpos=zpos))
    fused = fuse(chain, RES)
    fused_out = fused(None, np.float32(xpos), np.float32(zpos))

    np.testing.assert_allclose(
        np.asarray(driver_out.data), np.asarray(fused_out),
        rtol=1e-5, atol=1e-6,
        err_msg=f"seed {seed}: driver != fused for chain {chain}")
