"""Slow-but-obvious NumPy oracles for the noise primitives.

Independent second transcription of the published webgl-noise algorithms
(Ashima Arts / Stefan Gustavson) that Unity.Mathematics ships and the
reference consumes (/root/reference/Noise/Fractal/Fractal.cs:141-278).
Written scalar-style over the last axis to be maximally obvious, not fast.

Oracles run in float32 by default: the Burst reference is float32, and the
lattice-hash branch decisions (floor/frac of hashed values) legitimately
differ between float32 and float64 — e.g. ``7 * (1/7)`` rounds to 1.0 in
f32 but 0.999... in f64.  A tiny fraction of sample points near those
discontinuities may still flip branches vs the JAX implementation due to
operation-ordering differences; tests allow a bounded outlier fraction.
"""

import numpy as np

DTYPE = np.float32


def _cast(x):
    return np.asarray(x, DTYPE)


def mod289(x):
    return x - np.floor(x * (1.0 / 289.0)) * 289.0


def mod7(x):
    return x - np.floor(x * (1.0 / 7.0)) * 7.0


def permute(x):
    return mod289((34.0 * x + 1.0) * x)


def taylor_inv_sqrt(r):
    return 1.79284291400159 - 0.85373472095314 * r


def fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def frac(x):
    return x - np.floor(x)


def cnoise2(P):
    """Classic Perlin 2D. P: (..., 2) float64."""
    P = _cast(P)
    Pi = np.floor(P)
    Pf = P - Pi
    corners = {}
    for cx in (0, 1):
        for cy in (0, 1):
            ix = mod289(Pi[..., 0] + cx)
            iy = mod289(Pi[..., 1] + cy)
            fx = Pf[..., 0] - cx
            fy = Pf[..., 1] - cy
            i = permute(permute(ix) + iy)
            gx = frac(i / 41.0) * 2.0 - 1.0
            gy = np.abs(gx) - 0.5
            gx = gx - np.floor(gx + 0.5)
            norm = taylor_inv_sqrt(gx * gx + gy * gy)
            corners[(cx, cy)] = norm * (gx * fx + gy * fy)
    fx, fy = fade(Pf[..., 0]), fade(Pf[..., 1])
    nx0 = corners[(0, 0)] * (1 - fx) + corners[(1, 0)] * fx
    nx1 = corners[(0, 1)] * (1 - fx) + corners[(1, 1)] * fx
    return 2.3 * (nx0 * (1 - fy) + nx1 * fy)


def cnoise3(P):
    """Classic Perlin 3D. P: (..., 3) float64."""
    P = _cast(P)
    Pi = np.floor(P)
    Pf = P - Pi
    corners = {}
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = mod289(Pi[..., 0] + cx)
                iy = mod289(Pi[..., 1] + cy)
                iz = mod289(Pi[..., 2] + cz)
                fx = Pf[..., 0] - cx
                fy = Pf[..., 1] - cy
                fz = Pf[..., 2] - cz
                i = permute(permute(permute(ix) + iy) + iz)
                # exact base-7 digit extraction via integers (see noise.py
                # cnoise3 for why the gz<=0 branch must be exact)
                ii = i.astype(np.int64)
                k = (ii % 7).astype(DTYPE)
                m = ((ii // 7) % 7).astype(DTYPE)
                gx = k / 7.0
                gy = m / 7.0 - 0.5
                gz = 0.5 - np.abs(gx) - np.abs(gy)
                sz = (2 * (ii % 7) + np.abs(2 * ((ii // 7) % 7) - 7) >= 7).astype(DTYPE)
                gx -= sz * 0.5
                gy -= sz * (((ii // 7) % 7 >= 4).astype(DTYPE) - 0.5)
                norm = taylor_inv_sqrt(gx * gx + gy * gy + gz * gz)
                corners[(cx, cy, cz)] = norm * (gx * fx + gy * fy + gz * fz)
    fx, fy, fz = fade(Pf[..., 0]), fade(Pf[..., 1]), fade(Pf[..., 2])

    def mix(a, b, t):
        return a * (1 - t) + b * t

    nz = {
        (cx, cy): mix(corners[(cx, cy, 0)], corners[(cx, cy, 1)], fz)
        for cx in (0, 1) for cy in (0, 1)
    }
    ny0 = mix(nz[(0, 0)], nz[(0, 1)], fy)
    ny1 = mix(nz[(1, 0)], nz[(1, 1)], fy)
    return 2.2 * mix(ny0, ny1, fx)


def snoise2(P):
    """Simplex 2D. P: (..., 2) float64."""
    P = _cast(P)
    x, y = P[..., 0], P[..., 1]
    F2 = 0.366025403784439
    G2 = 0.211324865405187
    s = (x + y) * F2
    i = np.floor(x + s)
    j = np.floor(y + s)
    t = (i + j) * G2
    x0 = x - (i - t)
    y0 = y - (j - t)
    i1 = (x0 > y0).astype(DTYPE)
    j1 = 1.0 - i1
    offs = [(np.zeros_like(i1), np.zeros_like(j1)), (i1, j1),
            (np.ones_like(i1), np.ones_like(j1))]
    total = np.zeros_like(x0)
    for oi, oj in offs:
        xd = x0 - oi + (oi + oj) * G2
        yd = y0 - oj + (oi + oj) * G2
        m = np.maximum(0.5 - xd * xd - yd * yd, 0.0) ** 4
        p = permute(permute(mod289(j) + oj) + mod289(i) + oi)
        gx = 2.0 * frac(p / 41.0) - 1.0
        h = np.abs(gx) - 0.5
        a0 = gx - np.floor(gx + 0.5)
        m = m * (1.79284291400159 - 0.85373472095314 * (a0 * a0 + h * h))
        total += m * (a0 * xd + h * yd)
    return 130.0 * total


def snoise3(P):
    """Simplex 3D. P: (..., 3) float64."""
    P = _cast(P)
    v = P
    C = (1.0 / 6.0, 1.0 / 3.0)
    s = v.sum(-1) * C[1]
    ijk = np.floor(v + s[..., None])
    t = ijk.sum(-1) * C[0]
    x0 = v - ijk + t[..., None]

    gx = (x0[..., 0] >= x0[..., 1]).astype(DTYPE)
    gy = (x0[..., 1] >= x0[..., 2]).astype(DTYPE)
    gz = (x0[..., 2] >= x0[..., 0]).astype(DTYPE)
    lx, ly, lz = 1 - gx, 1 - gy, 1 - gz
    i1 = np.stack([np.minimum(gx, lz), np.minimum(gy, lx), np.minimum(gz, ly)], -1)
    i2 = np.stack([np.maximum(gx, lz), np.maximum(gy, lx), np.maximum(gz, ly)], -1)

    x1 = x0 - i1 + C[0]
    x2 = x0 - i2 + C[1]
    x3 = x0 - 0.5
    ijkm = mod289(ijk)

    def hash_corner(off):
        return permute(
            permute(
                permute(ijkm[..., 2] + off[..., 2]) + ijkm[..., 1] + off[..., 1]
            ) + ijkm[..., 0] + off[..., 0]
        )

    zeros = np.zeros_like(i1)
    ones = np.ones_like(i1)
    ps = [hash_corner(o) for o in (zeros, i1, i2, ones)]
    xs = [x0, x1, x2, x3]

    ns_x = 2.0 / 7.0
    ns_y = 0.5 / 7.0 - 1.0
    ns_z = 1.0 / 7.0
    total = np.zeros_like(s)
    for p, xd in zip(ps, xs):
        # exact base-7 digits via integers (see noise.py snoise3)
        pi = p.astype(np.int64) % 49
        x_ = (pi // 7).astype(DTYPE)
        y_ = (pi % 7).astype(DTYPE)
        gxc = x_ * ns_x + ns_y
        gyc = y_ * ns_x + ns_y
        h = 1.0 - np.abs(gxc) - np.abs(gyc)
        sx = np.where(pi // 7 <= 3, -1.0, 1.0).astype(DTYPE)
        sy = np.where(pi % 7 <= 3, -1.0, 1.0).astype(DTYPE)
        sh = -(np.abs(4 * (pi // 7) - 13) + np.abs(4 * (pi % 7) - 13) >= 14).astype(DTYPE)
        gxc = gxc + sx * sh
        gyc = gyc + sy * sh
        g = np.stack([gxc, gyc, h], -1)
        norm = taylor_inv_sqrt((g * g).sum(-1))
        g = g * norm[..., None]
        m = np.maximum(0.6 - (xd * xd).sum(-1), 0.0)
        m = m * m
        total += m * m * (g * xd).sum(-1)
    return 42.0 * total


def rgrad2(px, py, rot):
    u = permute(permute(px) + py) * 0.0243902439 + rot
    u = frac(u) * 6.28318530718
    return np.cos(u), np.sin(u)


def psrnoise2(P, per, rot=0.0):
    """Periodic simplex w/ rotating gradients, 2D. P: (..., 2)."""
    P = _cast(P)
    x = P[..., 0]
    y = P[..., 1] + 0.001
    uvx = x + y * 0.5
    uvy = y
    i0x, i0y = np.floor(uvx), np.floor(uvy)
    f0x, f0y = uvx - i0x, uvy - i0y
    i1x = (f0x > f0y).astype(DTYPE)
    i1y = 1.0 - i1x
    p0 = (i0x - i0y * 0.5, i0y)
    p1 = (p0[0] + i1x - i1y * 0.5, p0[1] + i1y)
    p2 = (p0[0] + 0.5, p0[1] + 1.0)
    total = np.zeros_like(x)
    for px, py in (p0, p1, p2):
        dx, dy = x - px, y - py
        xw = np.fmod(px, per[0])
        yw = np.fmod(py, per[1])
        gx, gy = rgrad2(xw + 0.5 * yw, yw, rot)
        w = gx * dx + gy * dy
        t = np.maximum(0.8 - (dx * dx + dy * dy), 0.0) ** 4
        total += t * w
    return 11.0 * total


def cellular2(P):
    """Worley 2D (F1, F2), 3x3 neighborhood, jitter 1."""
    P = _cast(P)
    K = 1.0 / 7.0
    Ko = 3.0 / 7.0
    Pi = mod289(np.floor(P))
    Pf = P - np.floor(P)
    dists = []
    for ox in (-1.0, 0.0, 1.0):
        for oy in (-1.0, 0.0, 1.0):
            p = permute(permute(Pi[..., 0] + ox) + Pi[..., 1] + oy)
            jx = frac(p * K) - Ko
            jy = mod7(np.floor(p * K)) * K - Ko
            dx = Pf[..., 0] - (ox + 0.5) + jx
            dy = Pf[..., 1] - (oy + 0.5) + jy
            dists.append(dx * dx + dy * dy)
    d = np.sort(np.stack(dists, -1), axis=-1)
    return np.sqrt(d[..., 0]), np.sqrt(d[..., 1])
