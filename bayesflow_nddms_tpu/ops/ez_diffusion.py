"""EZ-diffusion closed-form estimator (Wagenmakers, van der Maas &
Grasman 2007).

Capability parity with the EZ estimator used by the reference's
identifiability demos (``simulations/Basic_DDM_simulations.py:131-156``, a
port of Poldrack's ezdiff). Re-derived here from the published moment
equations and vectorized over datasets:

  with L = logit(Pc), x = L*(Pc^2*L - Pc*L + Pc - 1/2) / VRT,
    drift    v = sign(Pc - 1/2) * s * x^(1/4)
    boundary a = s^2 * L / v
    mean decision time  MDT = (a / 2v) * (1 - exp(-v a / s^2)) /
                                          (1 + exp(-v a / s^2))
    ndt      Ter = MRT - MDT

The scaling parameter s defaults to 1 — exactly the assumption the dcDDM
work shows hides the diffusion coefficient (Basic_DDM_simulations.py:
163-209): datasets generated with (v, a, dc)*k for any k>0 give the SAME
EZ estimates.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class EZEstimate(NamedTuple):
    drift: np.ndarray
    boundary: np.ndarray
    ndt: np.ndarray


def ez_diffusion(rt: np.ndarray, correct: np.ndarray,
                 s: float = 1.0) -> EZEstimate:
    """Estimate (drift, boundary, ndt) from RTs (s) and 0/1 accuracies.

    Accepts 1-D arrays (one dataset) or 2-D (datasets, trials) with NaN
    padding. The edge corrections (Pc == 1 or 0.5) match the convention of
    half a trial's worth of probability.

    Input guards match the reference's asserts
    (``simulations/Basic_DDM_simulations.py:133-146``): non-empty data,
    accuracies in [0, 1], at least one correct response (Pc > 0), and
    nonzero correct-RT variance — the closed form divides by VRT, so
    VRT == 0 would otherwise silently return inf/NaN estimates.
    """
    rt = np.atleast_2d(np.asarray(rt, np.float64))
    correct = np.atleast_2d(np.asarray(correct, np.float64))
    if rt.shape[-1] == 0:
        raise ValueError("ez_diffusion: empty trial axis")
    if rt.shape != correct.shape:
        raise ValueError(
            f"ez_diffusion: rt {rt.shape} vs correct {correct.shape}")
    if np.nanmax(correct) > 1 or np.nanmin(correct) < 0:
        raise ValueError("ez_diffusion: accuracies must lie in [0, 1]")
    n = np.sum(~np.isnan(correct), axis=1)
    pc = np.nanmean(correct, axis=1)
    if np.any(pc <= 0):
        raise ValueError("ez_diffusion: a dataset has no correct responses "
                         "(Pc == 0); the logit moment equations need Pc > 0")
    pc = np.where(pc >= 1.0, 1.0 - 1.0 / (2 * n), pc)
    pc = np.where(pc <= 0.0, 1.0 / (2 * n), pc)
    pc = np.where(pc == 0.5, 0.5 + 1.0 / (2 * n), pc)

    rt_c = np.where(correct == 1, rt, np.nan)
    mrt = np.nanmean(rt_c, axis=1)
    vrt = np.nanvar(rt_c, axis=1)
    if np.any(~(vrt > 0)):
        raise ValueError("ez_diffusion: correct-RT variance must be > 0 "
                         "(Basic_DDM_simulations.py:146)")

    L = np.log(pc / (1 - pc))
    x = L * (pc**2 * L - pc * L + pc - 0.5) / vrt
    v = np.sign(pc - 0.5) * s * x**0.25
    a = s**2 * L / v
    y = np.exp(-v * a / s**2)
    mdt = (a / (2 * v)) * (1 - y) / (1 + y)
    ter = mrt - mdt
    return EZEstimate(drift=v.squeeze(), boundary=a.squeeze(),
                      ndt=ter.squeeze())
