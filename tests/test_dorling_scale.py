"""Scalable-mode Dorling at a few hundred regions: invariants + exact
match against the local Jacobi oracle (SURVEY.md §4.3.2 mode='scalable')."""

import math

import numpy as np
import pytest

from ecmm428_pycart_spark import Cartogram
from ecmm428_pycart_spark.geometry import core
from ecmm428_pycart_spark.plans import dorling_core

N_SIDE = 12  # 144 regions — the reference's demonstrated scale is ~370


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = []
    for k in range(N_SIDE * N_SIDE):
        gx, gy = k % N_SIDE, k // N_SIDE
        ring = np.asarray([(gx, gy), (gx + 1, gy), (gx + 1, gy + 1),
                           (gx, gy + 1), (gx, gy)], dtype="f8")
        rows.append((k, f"r{k}", float((k % 13) + 1),
                     core.dumps(("Polygon", [ring]))))
    return spark.createDataFrame(
        rows, "region_idx long, name string, value double, geometry binary")


def _local(grid_rows):
    values = np.array([r["value"] for r in grid_rows])
    n = len(values)
    side = N_SIDE
    cents = [(r["region_idx"] % side + 0.5, r["region_idx"] // side + 0.5)
             for r in grid_rows]
    perims = np.full(n, 4.0)
    edges = []
    for k in range(n):
        gx, gy = k % side, k // side
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nx, ny = gx + dx, gy + dy
                if 0 <= nx < side and 0 <= ny < side:
                    j = ny * side + nx
                    w = 1.0 if abs(dx) + abs(dy) == 1 else 0.0
                    edges.append((k, j, w))
    D = sum(math.hypot(cents[j][0] - cents[i][0], cents[j][1] - cents[i][1])
            for i, j, _ in edges)
    R = sum(math.sqrt(values[i] / math.pi) + math.sqrt(values[j] / math.pi)
            for i, j, _ in edges)
    k_coef = D / R
    radii = np.sqrt(values / math.pi) * k_coef
    return cents, values, perims, edges, radii


def test_scalable_matches_jacobi_oracle_at_scale(spark, grid_df):
    grid_rows = sorted(grid_df.collect(), key=lambda r: r["region_idx"])
    cents, values, perims, edges, radii = _local(grid_rows)
    x = np.array([c[0] for c in cents])
    y = np.array([c[1] for c in cents])
    wmap = {(i, j): w for i, j, w in edges}
    widest = radii.max()
    iters = 3
    for _ in range(iters):
        x, y = dorling_core.jacobi_step(x, y, radii, perims, wmap,
                                        ratio=0.4, friction=0.5, widest=widest)

    cart = Cartogram(grid_df, "value", "name", idx_field="region_idx")
    out = {r["region_idx"]: r
           for r in cart.dorling(iterations=iters, mode="scalable").collect()}
    assert len(out) == N_SIDE * N_SIDE
    ex = np.array([out[i]["cx"] for i in range(len(x))])
    ey = np.array([out[i]["cy"] for i in range(len(y))])
    np.testing.assert_allclose(ex, x, atol=1e-8)
    np.testing.assert_allclose(ey, y, atol=1e-8)
    # invariants: radii preserved exactly, no NaNs, bounded displacement
    for i in range(len(x)):
        assert out[i]["radius"] == pytest.approx(radii[i], rel=1e-9)
        assert abs(out[i]["cx"] - cents[i][0]) < iters * widest


def test_scalable_dorling_shuffle_join_fallback_matches_broadcast(
        spark, monkeypatch):
    """Above _BROADCAST_REGIONS the per-iteration borders/forces joins
    fall back from broadcast to shuffle hash joins — the path a real
    100 TB run takes, which the default tests never exercise. Forcing
    the threshold to 0 must reproduce the broadcast path's positions
    to near machine precision. NOT bit-for-bit: the per-focal
    groupBy(sum) accumulates float forces in partition order, which
    differs across join strategies, so the last ULP can move —
    Jacobi is mathematically partitioning-independent, IEEE addition
    is not associative."""
    from ecmm428_pycart_spark.benchmarks.geo_queries import _grid
    from ecmm428_pycart_spark.plans.cartogram import Cartogram

    def run():
        cart = Cartogram(_grid(spark, "/root/testdata/sf0.001"),
                         "value", "n_name", idx_field="region_idx")
        out = cart.dorling(iterations=3, mode="scalable")
        return sorted(
            (r["n_name"], r["cx"], r["cy"], r["radius"])
            for r in out.select("n_name", "cx", "cy", "radius").collect())

    base = run()
    monkeypatch.setattr(Cartogram, "_BROADCAST_REGIONS", 0)
    fallback = run()
    assert [r[0] for r in fallback] == [r[0] for r in base]
    for (_, bx, by, br), (_, fx, fy, fr) in zip(base, fallback):
        assert fx == pytest.approx(bx, rel=1e-12, abs=1e-12)
        assert fy == pytest.approx(by, rel=1e-12, abs=1e-12)
        assert fr == br  # radii are never re-accumulated, stay exact


def test_dorling_lazy_checkpoints_match_eager_and_run_fewer_jobs(
        spark, grid_df, monkeypatch):
    """r14 "fewer jobs" lever (plans/cartogram._ckpt): lazy
    localCheckpoints compile the identical physical plans (same
    truncation, same partitioning) but defer materialization to the
    terminal action, collapsing the per-stage checkpoint jobs into
    one. Output must match the eager path to the last ULP (same
    caveat as the broadcast-fallback test: groupBy float sums are
    fetch-order sensitive, so approx at 1e-12, radii exact), and the
    lazy path must demonstrably run FEWER Spark jobs."""
    from ecmm428_pycart_spark.plans.cartogram import Cartogram

    def run(tag, eager_off):
        if eager_off:
            monkeypatch.setenv("SPARK_GRAFT_DORLING_LAZYCKPT_OFF", "1")
        else:
            monkeypatch.delenv("SPARK_GRAFT_DORLING_LAZYCKPT_OFF",
                               raising=False)
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        try:
            cart = Cartogram(grid_df, "value", "name",
                             idx_field="region_idx")
            rows = (cart.dorling(iterations=3, mode="scalable")
                    .select("name", "cx", "cy", "radius").collect())
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(tag)
        return (sorted((r["name"], r["cx"], r["cy"], r["radius"])
                       for r in rows), len(jobs))

    lazy_rows, lazy_jobs = run("dorling-arm-lazy", eager_off=False)
    eager_rows, eager_jobs = run("dorling-arm-eager", eager_off=True)
    assert [r[0] for r in lazy_rows] == [r[0] for r in eager_rows]
    for (_, lx, ly, lr), (_, ex, ey, er) in zip(lazy_rows, eager_rows):
        assert lx == pytest.approx(ex, rel=1e-12, abs=1e-12)
        assert ly == pytest.approx(ey, rel=1e-12, abs=1e-12)
        assert lr == er
    # eager runs one blocking job per checkpoint (base, borders, state,
    # one per iteration) ON TOP of the jobs both arms share (the setup
    # collect, one broadcast-collect per broadcast join per iteration,
    # doCheckpoint backfill, the terminal action) — so the pin is
    # strictly-fewer, not an absolute count.
    assert lazy_jobs < eager_jobs, (
        f"lazy dorling must run fewer jobs ({lazy_jobs} vs {eager_jobs})")
