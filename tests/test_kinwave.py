"""Kinematic wave kernel vs a serial per-pixel oracle.

The oracle follows the reference solver's exact algorithm
(kinematic_wave_parallel_tools.py:34-92): topological sweep headwaters ->
outlets, per-pixel Newton-Raphson with analytic secant-bound initial guess.
"""
import os
from math import fabs

import numpy as np
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.io import build_grid, MapLoader
from lisflood_tpu.graph import build_flow_graph, build_schedule
from lisflood_tpu.ops.kinwave import KinematicWaveRouter

TOL = 1e-12
MAX_ITERS = 3000


def serial_oracle(graph, discharge, lateral, a_dx_div_dt, beta):
    """Serial reference implementation (same math as kwpt.solve1Pixel)."""
    P = graph.num_pixels
    q = discharge.copy()
    constant = a_dx_div_dt * discharge ** beta + lateral
    order = graph.topo_order_down_up()[::-1]  # headwaters first
    ups = graph.upstream_lists()
    inv_beta = 1 / beta
    bm1 = beta - 1
    for p in order:
        upstream_inflow = sum(q[u] for u in ups[p])
        c = upstream_inflow + constant[p]
        if c <= TOL:
            q[p] = 0.0
            continue
        badx = beta * a_dx_div_dt[p]
        a_pow = badx * c ** bm1
        secant = c / (1 + a_pow) if a_pow <= 1 else c / (1 + a_pow ** inv_beta)
        other = ((c - secant) / a_dx_div_dt[p]) ** inv_beta
        qp = 0.5 * (secant + other)
        prev = -1.0
        count = 0
        err = qp + a_dx_div_dt[p] * qp ** beta - c
        while fabs(err) > TOL and qp != prev and count < MAX_ITERS:
            prev = qp
            qp -= err / (1 + badx * qp ** bm1)
            qp = max(qp, TOL)
            err = qp + a_dx_div_dt[p] * qp ** beta - c
            count += 1
        if qp == TOL:
            qp = 0.0
        q[p] = qp
    return q


@pytest.fixture(scope="module")
def env(etrs89_case):
    s = load_settings(os.path.join(etrs89_case, "settings", "base.xml"),
                      vars_to_set={"StepStart": "02/01/2016 06:00",
                                   "StepEnd": "02/07/2016 06:00", "DtSec": "86400"})
    grid0 = build_grid(s.binding["MaskMap"])
    loader = MapLoader(s, grid0)
    grid = build_grid(s.binding["MaskMap"], ldd2d=loader.load_2d("Ldd"))
    loader = MapLoader(s, grid)
    graph = build_flow_graph(loader.load("Ldd"), grid)
    return s, grid, loader, graph


@pytest.mark.slow
def test_route_matches_serial_oracle(env):
    s, grid, loader, graph = env
    P = graph.num_pixels
    rng = np.random.default_rng(42)
    beta = 0.6
    dx = np.full(P, 5000.0)
    dt = 3600.0
    alpha = rng.uniform(0.5, 5.0, P)
    a_dx_div_dt = alpha * dx / dt
    Q0 = rng.uniform(0.0, 50.0, P)
    qlat = rng.uniform(0.0, 1e-4, P)  # specific lateral inflow [m2/s]

    expected = serial_oracle(graph, Q0, qlat * dx, a_dx_div_dt, beta)

    sched = build_schedule(graph, chunk_size=128)
    router = KinematicWaveRouter.build(sched, alpha, beta, dx, dt)
    got = np.asarray(router.routing(Q0, qlat))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_route_zero_inflow_drains(env):
    s, grid, loader, graph = env
    P = graph.num_pixels
    beta = 0.6
    alpha = np.full(P, 2.0)
    sched = build_schedule(graph, chunk_size=128)
    router = KinematicWaveRouter.build(sched, alpha, beta, 5000.0, 3600.0)
    Q = np.full(P, 10.0)
    for _ in range(5):
        Q = np.asarray(router.routing(Q, np.zeros(P)))
    assert np.isfinite(Q).all()
    assert (Q >= 0).all()


@pytest.mark.slow
def test_packed_router_matches_serial_oracle(env):
    """The scatter-free packed sweep (the production path) against the
    serial Newton oracle — same gate as the scan path."""
    from lisflood_tpu.ops.kinwave_packed import PackedRouter

    s, grid, loader, graph = env
    P = graph.num_pixels
    rng = np.random.default_rng(7)
    beta = 0.6
    dx = np.full(P, 5000.0)
    dt = 3600.0
    alpha = rng.uniform(0.5, 5.0, P)
    a_dx_div_dt = alpha * dx / dt
    Q0 = rng.uniform(0.0, 50.0, P)
    qlat = rng.uniform(0.0, 1e-4, P)

    expected = serial_oracle(graph, Q0, qlat * dx, a_dx_div_dt, beta)

    sched = build_schedule(graph, chunk_size=128)
    router = PackedRouter(sched)
    got = np.asarray(router.route(Q0, qlat * dx, a_dx_div_dt, beta))
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12)


def test_packed_equals_scan_router(env):
    """Equivalence of the two routing kernels on the real drainage graph
    (multi-lane batched form), 1e-12."""
    from lisflood_tpu.ops.kinwave import ScanRouter
    from lisflood_tpu.ops.kinwave_packed import PackedRouter

    s, grid, loader, graph = env
    P = graph.num_pixels
    rng = np.random.default_rng(3)
    beta = 0.6
    L = 3
    q0 = rng.uniform(0, 100, (L, P))
    lat = rng.uniform(0, 5, (L, P))
    adx = rng.uniform(1e-3, 1e3, (L, P))
    sched = build_schedule(graph)
    a = np.asarray(ScanRouter(sched).route_batched(q0, lat, adx, beta))
    b = np.asarray(PackedRouter(sched).route_batched(q0, lat, adx, beta))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12)


def test_newton_fixed_iterations_converge():
    """Adversarial convergence sweep for the fixed-iteration Newton solve
    (the claim behind NEWTON_FIXED_ITERS=6): across channel-geometry
    extremes the 6-iteration result equals the 18-iteration result exactly
    (frozen fixed point) and satisfies the reference solver's stopping
    contract |err|<=1e-12 or stationarity
    (kinematic_wave_parallel_tools.py:26-28,64-71)."""
    import jax.numpy as jnp
    from lisflood_tpu.ops.kinwave_packed import _newton_unrolled

    beta = 0.6
    # a*dx/dt from extremes: alpha in [5e-4 (huge deep channel), 5e2
    # (steep rough trickle)], dx in [50 m, 10 km], dt in [60 s, 86400 s]
    adx_vals = np.logspace(-4, 5, 40)
    # const = a*dx/dt*Qold^beta + q*dx covers drought trickles to mega-floods
    c_vals = np.logspace(-10, 6, 40)
    adx, c = np.meshgrid(adx_vals, c_vals)
    adx = jnp.asarray(adx.ravel())
    c = jnp.asarray(c.ravel())

    q6 = np.asarray(_newton_unrolled(c, adx, beta, iters=6))
    q18 = np.asarray(_newton_unrolled(c, adx, beta, iters=18))
    np.testing.assert_array_equal(q6, q18)

    err = np.abs(q6 + np.asarray(adx) * q6 ** beta - np.asarray(c))
    # reference stopping contract: tol, stationarity (captured by q6==q18
    # above, in ulps of the operands), or the sub-tolerance zero
    # short-circuit (solutions below NEWTON_TOL are snapped to 0, exactly
    # like solve1Pixel)
    eps = np.finfo(np.float64).eps
    ok = (q6 == 0.0) | (err <= 1e-12) | (err <= 16 * eps * np.asarray(c))
    assert ok.all(), f"max residual {err.max()} at c={np.asarray(c)[err.argmax()]}"


def test_newton_v_polynomial_solver():
    """The beta=3/5 float32 polynomial solver (kinwave_packed._newton_v,
    the transcendental-free Mosaic/XLA f32 production path) against an
    f64 bisection ground truth over the adversarial (a, c) sweep: max
    relative error at the f32 noise floor (measured 6.6e-7; the q-space
    4-iteration f32 solver's worst case on the same sweep is 5.9e-4), and
    the dispatch contract of newton_solve (f32+0.6 -> v-space, f64 ->
    reference q-space) holds."""
    import jax.numpy as jnp
    from lisflood_tpu.ops.kinwave_packed import _newton_unrolled, newton_solve

    beta = 0.6
    rng = np.random.default_rng(7)
    N = 100000
    a = 10 ** rng.uniform(-4, 4, N)
    c = 10 ** rng.uniform(-10, 8, N)
    # f64 ground truth: 200 bisection steps on q in [0, c]
    lo, hi = np.zeros_like(c), c.copy()
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        f = mid + a * mid ** beta - c
        lo = np.where(f < 0, mid, lo)
        hi = np.where(f < 0, hi, mid)
    q_true = 0.5 * (lo + hi)

    q32 = np.asarray(newton_solve(jnp.asarray(c, jnp.float32),
                                  jnp.asarray(a, jnp.float32), beta))
    m = q_true > 1e-9
    rel = np.abs(q32[m] - q_true[m]) / q_true[m]
    assert rel.max() < 3e-6, f"v-space solver max rel err {rel.max()}"

    # f64 keeps the reference q-space iteration bit-for-bit
    q64 = np.asarray(newton_solve(jnp.asarray(c), jnp.asarray(a), beta))
    q64_ref = np.asarray(_newton_unrolled(jnp.asarray(c), jnp.asarray(a), beta))
    np.testing.assert_array_equal(q64, q64_ref)

    # generic beta falls back to the q-space iteration at f32 too
    qb = np.asarray(newton_solve(jnp.asarray(c, jnp.float32),
                                 jnp.asarray(a, jnp.float32), 0.72))
    qb_ref = np.asarray(_newton_unrolled(jnp.asarray(c, jnp.float32),
                                         jnp.asarray(a, jnp.float32), 0.72))
    np.testing.assert_array_equal(qb, qb_ref)


def test_mass_is_transported_downstream(env):
    """Inject water at one headwater pixel; discharge must appear at its
    downstream neighbour after routing."""
    s, grid, loader, graph = env
    P = graph.num_pixels
    dist = graph.topo_distance()
    head = int(np.argmax(dist))
    down = graph.downstream[head]
    beta = 0.6
    alpha = np.full(P, 1.5)
    sched = build_schedule(graph)
    router = KinematicWaveRouter.build(sched, alpha, beta, 5000.0, 86400.0)
    qlat = np.zeros(P)
    qlat[head] = 1e-3
    Q = np.asarray(router.routing(np.zeros(P), qlat))
    assert Q[head] > 0
    assert Q[down] > 0


@pytest.mark.slow
def test_sharded_router_matches_serial_oracle(env):
    """The subcatchment-sharded sweep (explicit cut-edge exchange) against
    the serial Newton oracle, at several shard counts — the single-catchment
    ETRS89 graph forces subtree splitting, so the cut-edge path is
    genuinely exercised (S=2 -> 1 cut edge, S=8 -> ~56)."""
    from lisflood_tpu.ops.kinwave_sharded import ShardedRouter
    from lisflood_tpu.parallel.partition import catchment_partition

    s, grid, loader, graph = env
    P = graph.num_pixels
    rng = np.random.default_rng(7)
    beta = 0.6
    dx = np.full(P, 5000.0)
    a_dx_div_dt = rng.uniform(0.5, 5.0, P) * dx / 3600.0
    Q0 = rng.uniform(0.0, 50.0, P)
    qlat = rng.uniform(0.0, 1e-4, P)
    expected = serial_oracle(graph, Q0, qlat * dx, a_dx_div_dt, beta)

    for n_shards in (2, 4, 8):
        shard_of, stats = catchment_partition(graph, n_shards)
        sizes = stats["shard_sizes"]
        assert sizes.max() <= np.ceil(P / n_shards) * 1.10 + 1, sizes
        router = ShardedRouter(graph, shard_of, chunk_size=128)
        if n_shards > 1:
            assert router.has_cuts     # single catchment must be split
        got = np.asarray(router.route(Q0, qlat * dx, a_dx_div_dt, beta))
        np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-12,
                                   err_msg=f"S={n_shards}")


def test_sharded_equals_packed_router(env):
    """Sharded vs packed kernels on the real graph (batched form). The only
    numerical difference is upstream-summation grouping (ulp-level)."""
    from lisflood_tpu.ops.kinwave_packed import PackedRouter
    from lisflood_tpu.ops.kinwave_sharded import ShardedRouter
    from lisflood_tpu.parallel.partition import catchment_partition

    s, grid, loader, graph = env
    P = graph.num_pixels
    rng = np.random.default_rng(3)
    beta = 0.6
    L = 3
    q0 = rng.uniform(0, 100, (L, P))
    lat = rng.uniform(0, 5, (L, P))
    adx = rng.uniform(1e-3, 1e3, (L, P))
    a = np.asarray(PackedRouter(build_schedule(graph)).route_batched(q0, lat, adx, beta))
    shard_of, _ = catchment_partition(graph, 4)
    b = np.asarray(ShardedRouter(graph, shard_of).route_batched(q0, lat, adx, beta))
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)
