"""Graph layer tests against the real ETRS89 drainage network."""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.io import build_grid, MapLoader
from lisflood_tpu.graph import build_flow_graph, build_schedule, ldd_to_channel, window_total


@pytest.fixture(scope="module")
def env(etrs89_case):
    s = load_settings(os.path.join(etrs89_case, "settings", "base.xml"),
                      vars_to_set={"StepStart": "02/01/2016 06:00",
                                   "StepEnd": "02/07/2016 06:00", "DtSec": "86400"})
    grid0 = build_grid(s.binding["MaskMap"])
    loader = MapLoader(s, grid0)
    grid = build_grid(s.binding["MaskMap"], ldd2d=loader.load_2d("Ldd"))
    loader = MapLoader(s, grid)
    ldd = loader.load("Ldd")
    graph = build_flow_graph(ldd, grid)
    return s, grid, loader, graph


def test_flow_graph_basic(env):
    s, grid, loader, graph = env
    assert graph.num_pixels == 2847
    # every non-pit downstream index is a valid pixel
    d = graph.downstream
    assert ((d >= -1) & (d < graph.num_pixels)).all()
    # topo distance consistent: dist(u) = dist(down(u)) + 1
    dist = graph.topo_distance()
    valid = d >= 0
    assert np.array_equal(dist[valid], dist[d[valid]] + 1)
    assert (dist[~valid] == 1).all()


def test_accuflux_matches_uparea_oracle(env):
    """accuflux(PixelArea) must reproduce the reference's upstream-area map
    (ec_upArea.nc was produced by PCRaster accuflux on the same ldd)."""
    s, grid, loader, graph = env
    pixarea = loader.load("PixelAreaUser")
    if isinstance(pixarea, float):
        pixarea = np.full(grid.num_pixels, pixarea)
    up = graph.accuflux(pixarea)
    ref = loader.load("UpAreaTrans")  # ec_upArea.nc: PCRaster accuflux output
    assert np.allclose(up, ref, rtol=1e-6)


def test_catchments(env):
    s, grid, loader, graph = env
    labels = graph.catchment_labels()
    assert (labels > 0).all()
    npits = int((graph.downstream == -1).sum())
    assert labels.max() == npits
    # label equals label of downstream pixel
    valid = graph.downstream >= 0
    assert np.array_equal(labels[valid], labels[graph.downstream[valid]])


def test_schedule_invariants(env):
    s, grid, loader, graph = env
    sched = build_schedule(graph, chunk_size=256)
    P = graph.num_pixels
    pix = sched.chunks[sched.chunks < P]
    assert sorted(pix.tolist()) == list(range(P))
    # dependency: upstream chunk strictly earlier
    chunk_of = np.empty(P, dtype=int)
    for i in range(sched.num_chunks):
        ch = sched.chunks[i]
        chunk_of[ch[ch < P]] = i
    valid = graph.downstream >= 0
    assert (chunk_of[graph.downstream[valid]] > chunk_of[np.flatnonzero(valid)]).all()
    # sequential depth no worse than the level count
    assert sched.num_chunks >= graph.topo_distance().max()


def test_ldd_to_channel(env):
    s, grid, loader, graph = env
    is_chan = loader.load("Channels") > 0
    ldd2 = ldd_to_channel(loader.load("Ldd"), is_chan)
    g2 = build_flow_graph(ldd2, grid)
    # all channel pixels are pits in the to-channel graph
    assert (g2.downstream[is_chan] == -1).all()


def test_window_total():
    a = np.arange(25, dtype=float).reshape(5, 5)
    wt = window_total(a, 3)
    # interior cell: sum of 3x3 neighborhood
    assert wt[2, 2] == a[1:4, 1:4].sum()
    # corner: only inside cells count
    assert wt[0, 0] == a[0:2, 0:2].sum()


def test_scatter_down_stencil_equivalence():
    """The 2-D LDD stencil form of the downstream transfer equals the
    segment-sum scatter up to addition order (ops/physics.
    scatter_down_stencil vs scatter_to_downstream), on a masked grid."""
    import jax.numpy as jnp
    from lisflood_tpu.graph.ldd import FlowGraph, direction_codes
    from lisflood_tpu.ops.physics import scatter_down_stencil, scatter_to_downstream

    rng = np.random.default_rng(4)
    nrows, ncols = 13, 17
    # random land mask + random adjacent drainage on land cells
    land2d = rng.uniform(0, 1, (nrows, ncols)) < 0.7
    flat_idx = np.flatnonzero(land2d.reshape(-1))
    P = flat_idx.size
    land_lookup = -np.ones(nrows * ncols, np.int64)
    land_lookup[flat_idx] = np.arange(P)
    downstream = np.full(P, -1, np.int32)
    offs = [(1, 0), (0, 1), (1, 1), (-1, 1), (1, -1), (-1, 0), (0, -1), (-1, -1)]
    for i, fl in enumerate(flat_idx):
        r, c = divmod(int(fl), ncols)
        rng.shuffle(offs)
        for dr, dc in offs:
            r2, c2 = r + dr, c + dc
            if 0 <= r2 < nrows and 0 <= c2 < ncols and land_lookup[r2 * ncols + c2] >= 0:
                # avoid 2-cycles at random; acyclicity is irrelevant for a
                # single-hop transfer test
                downstream[i] = land_lookup[r2 * ncols + c2]
                break
    codes2d, adjacent = direction_codes(downstream, flat_idx, nrows, ncols)
    assert adjacent
    down_sentinel = np.where(downstream >= 0, downstream, P).astype(np.int32)
    x = jnp.asarray(rng.uniform(0, 10, P))
    a = np.asarray(scatter_to_downstream(x, jnp.asarray(down_sentinel), P))
    b = np.asarray(scatter_down_stencil(x, jnp.asarray(codes2d),
                                        jnp.asarray(flat_idx.astype(np.int32)),
                                        nrows, ncols))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-12)
