"""Closest point on an ellipsoid (host f64).

Bisection root-finder adapted from the Geometric Tools derivation (public
document: DistancePointEllipseEllipsoid.pdf). Behavioral twin of the
reference's implementation at /root/reference/src/math/ellipsoid.rs:12-142.
Used by world->local transforms for ellipsoidal terrains
(terrain_model.rs:154-167). This only runs at config time / per-frame on the
host (tiny), so it stays numpy f64; device kernels never need it because
they operate in coordinate space with the Taylor relative path.
"""

from __future__ import annotations

import numpy as np

# After 1074 iterations the f64 bisection interval collapses
# (reference src/math/ellipsoid.rs:10).
MAX_ITERATIONS = 1074


def _get_root(r: np.ndarray, z: np.ndarray, g: float) -> float:
    """Bisection for the ellipse/ellipsoid root (reference ellipsoid.rs:92-142)."""
    n = r * z
    s0 = z[-1] - 1.0
    s1 = 0.0 if g < 0.0 else float(np.linalg.norm(n)) - 1.0
    s = 0.0
    for _ in range(MAX_ITERATIONS):
        s = (s0 + s1) / 2.0
        if s == s0 or s == s1:
            break
        ratio = n / (s + r)
        g = float(ratio @ ratio) - 1.0
        if g < 0.0:
            s1 = s
        elif g > 0.0:
            s0 = s
        else:
            break
    return s


def _project_point_ellipse(e: np.ndarray, y: np.ndarray) -> np.ndarray:
    """2D ellipse projection for first-quadrant points (reference ellipsoid.rs:65-90)."""
    if y[1] > 0.0:
        if y[0] > 0.0:
            z = y / e
            g = float(z @ z) - 1.0
            if g != 0.0:
                r = np.array([(e[0] * e[0]) / (e[1] * e[1]), 1.0])
                return r * y / (_get_root(r, z, g) + r)
            return y.copy()
        return np.array([0.0, e[1]])
    numer0 = e[0] * y[0]
    denom0 = e[0] * e[0] - e[1] * e[1]
    if numer0 < denom0:
        xde0 = numer0 / denom0
        return np.array([e[0] * xde0, e[1] * np.sqrt(1.0 - xde0 * xde0)])
    return np.array([e[0], 0.0])


def project_point_ellipsoid(e, y) -> np.ndarray:
    """Closest point on the axis-aligned ellipsoid with semi-axes ``e`` to ``y``.

    Both are xyz vectors; the reference permutes to a zxy-sorted frame where
    e[2] is the minor axis (reference ellipsoid.rs:12-63 works on ``y.xzy()``).
    """
    e = np.asarray(e, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # Rust f64::signum maps +-0.0 to +-1.0; copysign matches that.
    sign = np.copysign(1.0, y)
    # xzy permutation and abs, mirroring ellipsoid.rs:13-14. ``e`` is already
    # in the permuted frame: callers pass (major, major, minor)
    # (reference terrain_model.rs:160-163).
    yp = np.abs(y[[0, 2, 1]])
    ep = np.asarray(e, dtype=np.float64)

    if yp[2] > 0.0:
        if yp[1] > 0.0:
            if yp[0] > 0.0:
                z = yp / ep
                g = float(z @ z) - 1.0
                if g != 0.0:
                    r = np.array(
                        [
                            (ep[0] * ep[0]) / (ep[2] * ep[2]),
                            (ep[1] * ep[1]) / (ep[2] * ep[2]),
                            1.0,
                        ]
                    )
                    x = r * yp / (_get_root(r, z, g) + r)
                else:
                    x = yp.copy()
            else:
                res = _project_point_ellipse(ep[[1, 2]], yp[[1, 2]])
                x = np.array([0.0, res[0], res[1]])
        else:
            if yp[0] > 0.0:
                res = _project_point_ellipse(ep[[0, 2]], yp[[0, 2]])
                x = np.array([res[0], 0.0, res[1]])
            else:
                x = np.array([0.0, 0.0, ep[2]])
    else:
        denom0 = ep[0] * ep[0] - ep[2] * ep[2]
        denom1 = ep[1] * ep[1] - ep[2] * ep[2]
        numer0 = ep[0] * yp[0]
        numer1 = ep[1] * yp[1]
        x = None
        if numer0 < denom0 and numer1 < denom1:
            xde0 = numer0 / denom0
            xde1 = numer1 / denom1
            discr = 1.0 - xde0 * xde0 - xde1 * xde1
            if discr > 0.0:
                x = ep * np.array([xde0, xde1, np.sqrt(discr)])
        if x is None:
            res = _project_point_ellipse(ep[[0, 1]], yp[[0, 1]])
            x = np.array([res[0], res[1], 0.0])

    # undo the xzy permutation (reference ellipsoid.rs:62: sign * x.xzy())
    return sign * x[[0, 2, 1]]
