"""2D Newton inverse on a forward kernel — the engine's realization of the
reference's pj_generic_inverse_2d (src/generic_inverse.cpp), vectorized.

Two passes with different Jacobian-refresh policies, because the two
failure modes pull opposite ways:

* PASS 1 is reference-exact: the Jacobian is refreshed only while the
  residual is > 1e-6 ("speed things a bit" in the reference — but near a
  fold of a composite projection, e.g. peirce_q square's southern
  re-indexing, it is also a STABILIZER: a fresh finite difference taken
  across the fold is garbage, while the gate keeps the last good interior
  Jacobian for the final digits).
* PASS 2 (rescue, only for points pass 1 left unconverged) refreshes
  every round: a stale Jacobian can limit-cycle just above tolerance on
  sqrt-singular boundary edges (adams_ws2 at lam=pi), where a fresh one
  converges. The reference escapes that scalar case through libm rounding
  luck; two explicit passes are deterministic across libms.

Points unconverged after both passes are a domain error -> NaN
(the reference sets PROJ_ERR_COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN).
"""

from __future__ import annotations

import numpy as np

HALFPI = np.pi / 2
# keep iterates strictly inside the poles: the reference clamps to
# M_HALFPI and survives because C libm's tan(M_HALFPI/2) rounds just
# under 1, leaving a nonzero d/dlam at the pole; numpy's tan rounds to
# exactly 1 there, which would make pole-degenerate forwards (adams)
# exactly lam-independent and the Jacobian singular. A ~4 ulp nudge is
# below every corpus tolerance and libm-independent.
_PHI_CAP = HALFPI - 1e-15


def _newton(x, y, fwd, lam, phi, deltol, iters, always_refresh):
    shape = lam.shape
    dlx = np.zeros(shape)  # d lam / d X  (inverse-Jacobian entries)
    dly = np.zeros(shape)
    dpx = np.zeros(shape)
    dpy = np.zeros(shape)
    done = np.zeros(shape, dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(iters):
            fx, fy = fwd(lam, phi)
            dX = fx - x
            dY = fy - y
            done |= (np.abs(dX) < deltol) & (np.abs(dY) < deltol)
            if done.all():
                break
            if always_refresh:
                need = ~done
            else:
                need = (~done) & ((i == 0) | (np.abs(dX) > 1e-6)
                                  | (np.abs(dY) > 1e-6))
            dLam = np.where(lam > 0, -1e-6, 1e-6)
            fxl, fyl = fwd(lam + dLam, phi)
            jxl = (fxl - fx) / dLam
            jyl = (fyl - fy) / dLam
            dPhi = np.where(phi > 0, -1e-6, 1e-6)
            fxp, fyp = fwd(lam, phi + dPhi)
            jxp = (fxp - fx) / dPhi
            jyp = (fyp - fy) / dPhi
            det = jxl * jyp - jxp * jyl
            ok = need & (det != 0) & np.isfinite(det)
            safe = np.where(ok, det, 1.0)
            dlx = np.where(ok, jyp / safe, dlx)
            dly = np.where(ok, -jxp / safe, dly)
            dpx = np.where(ok, -jyl / safe, dpx)
            dpy = np.where(ok, jxl / safe, dpy)
            upd = ~done
            step_lam = np.clip(dX * dlx + dY * dly, -0.3, 0.3)
            lam = np.where(upd & (x != 0),
                           np.clip(lam - step_lam, -np.pi, np.pi), lam)
            step_phi = np.clip(dX * dpx + dY * dpy, -0.3, 0.3)
            phi = np.where(upd & (y != 0),
                           np.clip(phi - step_phi, -_PHI_CAP, _PHI_CAP), phi)
        else:
            # post-loop convergence test (reference returns mid-loop; the
            # final update deserves its own check before declaring failure)
            fx, fy = fwd(lam, phi)
            done |= (np.abs(fx - x) < deltol) & (np.abs(fy - y) < deltol)
    return lam, phi, done


def generic_inverse_2d(x, y, fwd, lam0, phi0, deltol: float = 1e-12,
                       iters: int = 15):
    """See module docstring. Convergence is tested BEFORE stepping (an
    exact seed at a Jacobian singularity — adams_ws2 at the origin —
    returns immediately); FD steps are 1e-6 toward the interior; a zero /
    non-finite Jacobian keeps the previous inverse derivatives; steps are
    clamped to ±0.3 rad with lam clamped to ±pi and phi strictly inside
    ±halfpi; lam (resp. phi) is frozen when the target x (resp. y) is
    exactly 0. Used by the ellipsoidal Cassini inverse (cass.cpp:121-123),
    wink2, vandg4, adams_ws2, and peirce_q square/diamond."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam_in = np.asarray(lam0, dtype=np.float64)
    phi_in = np.asarray(phi0, dtype=np.float64)
    shape = np.broadcast(lam_in, phi_in, x, y).shape
    lam0b = np.broadcast_to(lam_in, shape).copy()
    phi0b = np.clip(np.broadcast_to(phi_in, shape), -_PHI_CAP, _PHI_CAP)

    lam, phi, done = _newton(x, y, fwd, lam0b.copy(), phi0b.copy(),
                             deltol, iters, always_refresh=False)
    if not done.all():
        lam2, phi2, done2 = _newton(x, y, fwd, lam0b, phi0b,
                                    deltol, iters, always_refresh=True)
        rescue = (~done) & done2
        lam = np.where(rescue, lam2, lam)
        phi = np.where(rescue, phi2, phi)
        done |= done2
    return np.where(done, lam, np.nan), np.where(done, phi, np.nan)
