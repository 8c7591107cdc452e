"""Sequential Dorling force sweep — exact reference semantics, pure numpy.

Replicates the arithmetic of pycart/cartogram.py:343-402 (helpers
_repel :35-77 and _attract :80-138) including its quirks (SURVEY.md §2.5):

- Q1 Gauss–Seidel: positions update in region-index order *within* an
  iteration, so later regions see earlier regions already moved.
- Q3 non-neighbour "attraction" keeps the negative overlap, i.e. pushes
  away from non-touching candidates.
- Q4 clamp arithmetic, including the `+ 1.0` damping denominators.
- Q6 `stop` breaks at the start of iteration `i == stop`.

This function is driver-free (plain numpy) so it can run inside a
single-group applyInPandas for the exact-parity mode, and be unit-tested
without a SparkSession.
"""

from __future__ import annotations

import numpy as np


def dorling_sweep(x: np.ndarray, y: np.ndarray, radius: np.ndarray,
                  perimeter: np.ndarray,
                  border_focal: np.ndarray, border_neighbor: np.ndarray,
                  border_weight: np.ndarray,
                  iterations: int = 100, ratio: float = 0.4,
                  friction: float = 0.5, stop: int | None = None):
    """Run the iterative force simulation; returns updated (x, y).

    Arrays are indexed by region position 0..n-1; ``border_*`` is the
    directed edge list from get_borders. Mutates copies, not inputs.
    """
    x = x.astype("f8").copy()
    y = y.astype("f8").copy()
    radius = radius.astype("f8")
    n = len(x)
    widest = float(radius.max()) if n else 0.0

    # border weight lookup: dict keyed by (focal, neighbor). The reference
    # does a mask scan of the borders frame per pair (cartogram.py:121-126);
    # a hash lookup is the same semantics. Duplicate edges would make the
    # reference raise (Q7) — last-wins here, get_borders emits unique pairs.
    wmap = {}
    for f, nb, w in zip(border_focal, border_neighbor, border_weight):
        wmap[(int(f), int(nb))] = float(w)

    for i in range(iterations):
        if stop is not None and i == stop:
            break
        for idx in range(n):
            xrepel = yrepel = xattract = yattract = 0.0
            closest = widest

            dx = x - x[idx]
            dy = y - y[idx]
            dist = np.hypot(dx, dy)
            thresh = widest + radius[idx]
            mask = (dist > 0.0) & (dist < thresh)   # 'neither'-inclusive range
            if mask.any():
                nd = dist[mask]
                closest = widest if nd.min() > widest else float(nd.min())
                overlap = (radius[mask] + radius[idx]) - nd
                nidx = np.nonzero(mask)[0]
                for j, (ov, d) in enumerate(zip(overlap, nd)):
                    k = nidx[j]
                    if ov > 0.0:
                        xrepel -= ov * dx[k] / d
                        yrepel -= ov * dy[k] / d
                    else:
                        w = wmap.get((idx, int(k)))
                        if w is not None:
                            ov = abs(ov) * w / perimeter[idx]
                        xattract += ov * dx[k] / d
                        yattract += ov * dy[k] / d

            attract_dist = np.hypot(xattract, yattract)
            repel_dist = np.hypot(xrepel, yrepel)

            if repel_dist > closest:
                xrepel = closest * xrepel / (repel_dist + 1.0)
                yrepel = closest * yrepel / (repel_dist + 1.0)
                repel_dist = closest

            if repel_dist > 0.0:
                xtotal = (1.0 - ratio) * xrepel + ratio * (
                    repel_dist * xattract / (attract_dist + 1.0))
                ytotal = (1.0 - ratio) * yrepel + ratio * (
                    repel_dist * yattract / (attract_dist + 1.0))
            else:
                if attract_dist > closest:
                    xattract = closest * xattract / (attract_dist + 1.0)
                    yattract = closest * yattract / (attract_dist + 1.0)
                xtotal, ytotal = xattract, yattract

            x[idx] += friction * xtotal
            y[idx] += friction * ytotal

    return x, y


def jacobi_step(x: np.ndarray, y: np.ndarray, radius: np.ndarray,
                perimeter: np.ndarray, wmap: dict,
                ratio: float, friction: float, widest: float):
    """One synchronous (Jacobi) iteration — all forces computed against the
    same snapshot, then all positions updated. Used by tests as the local
    oracle for the distributed scalable mode."""
    n = len(x)
    nx, ny = x.copy(), y.copy()
    for idx in range(n):
        xrepel = yrepel = xattract = yattract = 0.0
        closest = widest
        dx = x - x[idx]
        dy = y - y[idx]
        dist = np.hypot(dx, dy)
        mask = (dist > 0.0) & (dist < widest + radius[idx])
        if mask.any():
            nd = dist[mask]
            closest = widest if nd.min() > widest else float(nd.min())
            overlap = (radius[mask] + radius[idx]) - nd
            for k, ov, d in zip(np.nonzero(mask)[0], overlap, nd):
                if ov > 0.0:
                    xrepel -= ov * dx[k] / d
                    yrepel -= ov * dy[k] / d
                else:
                    w = wmap.get((idx, int(k)))
                    if w is not None:
                        ov = abs(ov) * w / perimeter[idx]
                    xattract += ov * dx[k] / d
                    yattract += ov * dy[k] / d
        attract_dist = np.hypot(xattract, yattract)
        repel_dist = np.hypot(xrepel, yrepel)
        if repel_dist > closest:
            xrepel = closest * xrepel / (repel_dist + 1.0)
            yrepel = closest * yrepel / (repel_dist + 1.0)
            repel_dist = closest
        if repel_dist > 0.0:
            xtotal = (1.0 - ratio) * xrepel + ratio * (
                repel_dist * xattract / (attract_dist + 1.0))
            ytotal = (1.0 - ratio) * yrepel + ratio * (
                repel_dist * yattract / (attract_dist + 1.0))
        else:
            if attract_dist > closest:
                xattract = closest * xattract / (attract_dist + 1.0)
                yattract = closest * yattract / (attract_dist + 1.0)
            xtotal, ytotal = xattract, yattract
        nx[idx] = x[idx] + friction * xtotal
        ny[idx] = y[idx] + friction * ytotal
    return nx, ny
