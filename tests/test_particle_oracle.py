"""Trajectory-exact oracle for the Beyer particle descent.

Re-implements DescendSimultaneous (LiveErosionDataTypes.cs:273-432) as a
per-particle Python loop and checks the vectorized masked-scan version
reproduces positions, velocities, water/sediment and the per-cell event
accumulation step-for-step."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from noize_tpu.erosion import particles as P
from noize_tpu.erosion.params import ErosionParameters
from noize_tpu.erosion.world import NEIGHBOR_OFFSETS, WorldState

RNG = np.random.default_rng(77)

RING_DR = P.RING_DR
RING_DC = P.RING_DC
RING_TO_NB = P.RING_TO_NB
NB_TO_RING = P.NB_TO_RING


def np_descend(height, pool, flow, params, start, height_scale, patch_res,
               max_steps):
    """Single-particle loop oracle. Returns (events, trajectory)."""
    res = height.shape[0]
    row, col = float(start[0]), float(start[1])
    heading = -1
    vel, water, sediment = 0.01, 1.0, 0.0
    age = 0
    events = []   # (row_i, col_i, d_track, d_pool, d_sed)
    traj = []

    wih = height_scale * (height + pool)
    all_h = wih + params.FLOW_HEIGHT_CONTRIBUTION * flow

    def q(v):
        return math.trunc(float(100.0 * v)) / 100.0

    for _ in range(max_steps):
        ri = min(max(int(round(row)), 0), res - 1)
        ci = min(max(int(round(col)), 0), res - 1)
        traj.append((ri, ci, vel, water, sediment))
        if water < 0.01:
            events.append((ri, ci, 0.0, 0.0, sediment / height_scale))
            return events, traj
        if age >= params.MAXAGE:
            events.append((ri, ci, 0.0, water / height_scale,
                           sediment / height_scale))
            return events, traj
        current_h = wih[ri, ci]
        nb = []
        for dr, dc in NEIGHBOR_OFFSETS:
            rr = min(max(ri + dr, 0), res - 1)
            cc = min(max(ci + dc, 0), res - 1)
            nb.append(q(all_h[rr, cc]))
        drain_nb = int(np.argmin(nb))
        drain_height = nb[drain_nb]
        drain_ring = int(NB_TO_RING[drain_nb])
        h = drain_ring if heading < 0 else heading
        f_here = flow[ri, ci]
        eff_drag = params.DRAG * (1.0 - max(f_here, 0.0))
        eff_fric = params.FRICTION * (1.0 - max(f_here, 0.0))
        left, right = (h + 7) % 8, (h + 1) % 8
        hl = nb[RING_TO_NB[left]]
        hc = nb[RING_TO_NB[h]]
        hr = nb[RING_TO_NB[right]]
        if hl < hc and hl < hr:
            flow_ring, heading_h = left, hl
        elif hr < hl and hr < hc:
            flow_ring, heading_h = right, hr
        else:
            flow_ring, heading_h = h, hc
        h_diff = heading_h - current_h
        vel = vel - vel * eff_drag
        vloss = 0.0
        if h_diff < 0:
            new_ring = flow_ring
        else:
            theta = math.atan(h_diff / patch_res)
            loss = float("nan")
            if h_diff > 0:
                loss = math.sqrt(2 * abs(params.GRAVITY * math.sin(theta) + eff_fric)
                                 * (h_diff / math.sin(theta)))
            if not math.isnan(loss) and loss <= vel:
                new_ring = flow_ring
                vloss = loss
            else:
                d_diff = drain_height - current_h
                if d_diff > 0:
                    events.append((ri, ci, 0.0, water / height_scale,
                                   sediment / height_scale))
                    return events, traj
                new_ring = drain_ring
                h_diff = d_diff
        nrow = row + RING_DR[new_ring]
        ncol = col + RING_DC[new_ring]
        nri, nci = int(round(nrow)), int(round(ncol))
        if nri < 0 or nci < 0 or nri >= res or nci >= res:
            events.append((ri, ci, 0.0, 0.0, 0.0))
            return events, traj
        v_diff = abs(h_diff)
        theta_d = math.degrees(math.atan(v_diff / patch_res)) * (
            math.pi / math.pi)
        theta_d = math.atan(v_diff / patch_res) * 180.0 / 3.14159
        dv = 0.0
        if v_diff > 0:
            if h_diff > 0:
                dv = -vloss
            else:
                th = math.atan(v_diff / patch_res)
                dv = math.sqrt(2 * abs(params.GRAVITY * math.sin(th) - eff_fric)
                               * (v_diff / math.sin(th)))
        vel = max(vel + dv, 0.0)
        over = vel - params.TERMINAL_VELOCITY
        vel = vel - max(min(over, max(eff_drag * 0.25 * over * over, 0.0)), 0.0)
        if theta_d < 3.0 and vel < 1.0:
            events.append((ri, ci, 0.0, water / height_scale,
                           sediment / height_scale))
            return events, traj
        cap = vel * water * params.CAPACITY
        if sediment < cap:
            dep = -params.EROSION * (cap - sediment)
        else:
            dep = params.DEPOSITION * (sediment - cap)
        d_sed = dep / height_scale if abs(dep) > 0 else 0.0
        sediment -= dep
        events.append((ri, ci, water, 0.0, d_sed))
        water *= (1.0 - params.EVAP)
        row, col = nrow, ncol
        heading = new_ring
        age += 1
    return events, traj


def accumulate(events, res):
    track = np.zeros((res, res))
    poolm = np.zeros((res, res))
    sed = np.zeros((res, res))
    for r, c, t, p_, s in events:
        track[r, c] += t
        poolm[r, c] += p_
        sed[r, c] += s
    return track, poolm, sed


class TestDescentOracle:
    def run_case(self, seed, res=20, maxage=12):
        rng = np.random.default_rng(seed)
        height = rng.uniform(0.0, 0.8, (res, res)).astype(np.float32)
        pool = np.zeros((res, res), np.float32)
        flow = rng.uniform(0, 0.5, (res, res)).astype(np.float32)
        params = ErosionParameters(MAXAGE=maxage)
        state = WorldState(height=jnp.asarray(height), pool=jnp.asarray(pool),
                           flow=jnp.asarray(flow),
                           track=jnp.zeros((res, res)),
                           plants=jnp.zeros((res, res)))
        starts = [(int(r), int(c)) for r, c in
                  rng.integers(0, res, size=(8, 2))]
        n = len(starts)
        parts = P.Particles(
            row=jnp.asarray([s[0] for s in starts], jnp.float32),
            col=jnp.asarray([s[1] for s in starts], jnp.float32),
            heading=jnp.full((n,), -1, jnp.int32),
            vel=jnp.full((n,), 0.01, jnp.float32),
            water=jnp.ones((n,), jnp.float32),
            sediment=jnp.zeros((n,), jnp.float32),
            age=jnp.zeros((n,), jnp.int32),
            alive=jnp.ones((n,), bool),
        )
        _, track, poolm, sed = jax.jit(
            lambda p, s: P.descend_all(p, s, params, 1000.0, 1.0, res)
        )(parts, state)

        wt = np.zeros((res, res))
        wp = np.zeros((res, res))
        ws = np.zeros((res, res))
        for s in starts:
            ev, _ = np_descend(height, pool, flow, params, s, 1000.0, 1.0,
                               maxage + 1)
            t_, p_, s_ = accumulate(ev, res)
            wt += t_
            wp += p_
            ws += s_
        np.testing.assert_allclose(np.asarray(track), wt, atol=2e-4)
        np.testing.assert_allclose(np.asarray(poolm), wp, atol=2e-5)
        np.testing.assert_allclose(np.asarray(sed), ws, atol=2e-4)

    def test_random_terrain_a(self):
        self.run_case(0)

    def test_random_terrain_b(self):
        self.run_case(1, res=16, maxage=20)

    def test_slope(self):
        res = 24
        height = np.tile(np.linspace(0.9, 0.0, res, dtype=np.float32), (res, 1))
        pool = np.zeros((res, res), np.float32)
        flow = np.zeros((res, res), np.float32)
        params = ErosionParameters(MAXAGE=16)
        state = WorldState(height=jnp.asarray(height), pool=jnp.asarray(pool),
                           flow=jnp.asarray(flow), track=jnp.zeros((res, res)),
                           plants=jnp.zeros((res, res)))
        starts = [(5, 3), (12, 8), (20, 1)]
        n = len(starts)
        parts = P.Particles(
            row=jnp.asarray([s[0] for s in starts], jnp.float32),
            col=jnp.asarray([s[1] for s in starts], jnp.float32),
            heading=jnp.full((n,), -1, jnp.int32),
            vel=jnp.full((n,), 0.01, jnp.float32),
            water=jnp.ones((n,), jnp.float32),
            sediment=jnp.zeros((n,), jnp.float32),
            age=jnp.zeros((n,), jnp.int32),
            alive=jnp.ones((n,), bool),
        )
        _, track, poolm, sed = jax.jit(
            lambda p, s: P.descend_all(p, s, params, 1000.0, 1.0, res)
        )(parts, state)
        wt = np.zeros((res, res))
        wp = np.zeros((res, res))
        ws = np.zeros((res, res))
        for s in starts:
            ev, traj = np_descend(height, pool, flow, params, s, 1000.0, 1.0, 17)
            t_, p_, s_ = accumulate(ev, res)
            wt += t_
            wp += p_
            ws += s_
            # particles on a slope should travel several cells downhill
            assert len(traj) > 3
        np.testing.assert_allclose(np.asarray(track), wt, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sed), ws, atol=2e-4)
        np.testing.assert_allclose(np.asarray(poolm), wp, atol=2e-5)
