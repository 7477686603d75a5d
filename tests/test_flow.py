"""Flow map tests vs a direct-loop NumPy oracle of the pipe model."""

import numpy as np

from noize_tpu.ops import flow as FL

RNG = np.random.default_rng(11)
DT = 0.2


def np_flow_map(height, iterations, norm_min=-0.1, norm_max=0.1):
    """Loop transcription of FlowMapComponents.cs:16-173 + FlowMapStage DAG."""
    res = height.shape[0]
    water = np.full_like(height, 1e-4)
    flows = {d: np.zeros_like(height) for d in "WESN"}

    def cl(i):
        return np.clip(i, 0, res - 1)

    for _ in range(iterations):
        total = height + water
        new = {}
        for d, (dz, dx) in {"W": (0, -1), "E": (0, 1), "S": (-1, 0), "N": (1, 0)}.items():
            zi = cl(np.arange(res) + dz)[:, None]
            xi = cl(np.arange(res) + dx)[None, :]
            diff = total - total[zi, xi]
            new[d] = np.maximum(0.0, flows[d] + diff)
        s = sum(new.values())
        with np.errstate(divide="ignore", invalid="ignore"):
            k = np.where(s > 0, np.clip(water / (s * DT), 0, 1), 0.0)
        flows = {d: new[d] * k for d in "WESN"}
        flow_out = sum(flows.values())
        zi = np.arange(res)
        flow_in = (
            flows["E"][:, cl(zi - 1)]
            + flows["W"][:, cl(zi + 1)]
            + flows["N"][cl(zi - 1), :][:, :]
            + flows["S"][cl(zi + 1), :][:, :]
        )
        water = np.maximum(0.0, water + (flow_in - flow_out) * DT)

    dl = flows["E"][:, cl(zi - 1)] - flows["W"]
    dr = flows["E"] - flows["W"][:, cl(zi + 1)]
    dt = flows["S"][cl(zi + 1), :] - flows["N"]
    db = flows["S"] - flows["N"][cl(zi - 1), :]
    vx = (dl + dr) * 0.5
    vy = (dt + db) * 0.5
    v = np.sqrt(vx * vx + vy * vy)
    return (v - norm_min) / (norm_max - norm_min)


class TestFlowMap:
    def test_oracle(self):
        h = RNG.uniform(0, 1, (24, 24)).astype(np.float32)
        got = np.asarray(FL.flow_map(h, iterations=5))
        want = np_flow_map(h, 5)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_oracle_more_iterations(self):
        h = RNG.uniform(0, 0.5, (16, 16)).astype(np.float32)
        got = np.asarray(FL.flow_map(h, iterations=20))
        want = np_flow_map(h, 20)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_flat_terrain_no_velocity(self):
        h = np.zeros((16, 16), np.float32)
        out = np.asarray(FL.flow_map(h, iterations=8))
        # zero velocity everywhere → (0 - (-0.1)) / 0.2 = 0.5
        np.testing.assert_allclose(out, 0.5, atol=1e-6)

    def test_water_conservation_interior(self):
        """Water only leaves via the clamped boundary; flows are finite and
        non-negative throughout."""
        h = RNG.uniform(0, 1, (32, 32)).astype(np.float32)
        out = np.asarray(FL.flow_map(h, iterations=16))
        assert np.all(np.isfinite(out))

    def test_slope_has_flow(self):
        z = np.linspace(1, 0, 32, dtype=np.float32)
        h = np.tile(z, (32, 1))
        out = np.asarray(FL.flow_map(h, iterations=10))
        # downslope velocity > 0 → normalized above 0.5 somewhere
        assert out.max() > 0.5 + 1e-4
