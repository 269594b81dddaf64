"""Native (C++) graph preprocessing vs the NumPy reference implementation."""
import os

import numpy as np
import pytest

from lisflood_tpu.config import load_settings
from lisflood_tpu.io import build_grid, MapLoader
from lisflood_tpu.graph import build_flow_graph, build_schedule
from lisflood_tpu.graph import native
from lisflood_tpu.graph import ldd as _ldd


@pytest.fixture(autouse=True)
def force_python_fallbacks():
    """Pin the FlowGraph methods to the NumPy implementations so these
    tests genuinely compare native vs python (build_schedule and friends
    dispatch to the native library by default)."""
    _ldd.FORCE_PYTHON = True
    yield
    _ldd.FORCE_PYTHON = False

CASE = "/root/reference/tests/data/LF_ETRS89_UseCase"


@pytest.fixture(scope="module")
def graph():
    if native.load_library() is None:
        pytest.skip("native toolchain unavailable")
    s = load_settings(os.path.join(CASE, "settings", "base.xml"),
                      vars_to_set={"StepStart": "02/01/2016 06:00",
                                   "StepEnd": "02/07/2016 06:00", "DtSec": "86400"})
    grid0 = build_grid(s.binding["MaskMap"])
    loader = MapLoader(s, grid0)
    grid = build_grid(s.binding["MaskMap"], ldd2d=loader.load_2d("Ldd"))
    loader = MapLoader(s, grid)
    return build_flow_graph(loader.load("Ldd"), grid), grid, loader


def test_native_topo_distance(graph):
    g, grid, loader = graph
    np.testing.assert_array_equal(native.topo_distance(g.downstream), g.topo_distance())


def test_native_accuflux(graph):
    g, grid, loader = graph
    area = np.full(g.num_pixels, grid.cell**2)
    np.testing.assert_allclose(native.accuflux(g.downstream, area), g.accuflux(area), rtol=1e-12)


def test_native_catchments(graph):
    g, grid, loader = graph
    np.testing.assert_array_equal(native.catchment_labels(g.downstream), g.catchment_labels())


def test_native_pack_chunks_valid(graph):
    g, grid, loader = graph
    P = g.num_pixels
    chunks, chunk_of = native.pack_chunks(g.downstream, 256)
    pix = chunks[chunks < P]
    assert sorted(pix.tolist()) == list(range(P))
    valid = g.downstream >= 0
    assert (chunk_of[g.downstream[valid]] > chunk_of[np.flatnonzero(valid)]).all()
    # matches the python packer exactly (same greedy order)
    sched = build_schedule(g, chunk_size=256)
    np.testing.assert_array_equal(chunks, sched.chunks)


def test_native_speed_large_chain():
    if native.load_library() is None:
        pytest.skip("native toolchain unavailable")
    import time
    P = 2_000_000
    rng = np.random.default_rng(0)
    # random forest: each pixel drains to a random later pixel (topological by construction)
    down = np.minimum(np.arange(P) + rng.integers(1, 64, P), P).astype(np.int32)
    down[down >= P] = -1
    t0 = time.time()
    dist = native.topo_distance(down)
    acc = native.accuflux(down, np.ones(P))
    dt = time.time() - t0
    assert dist.max() > 0 and acc.max() > 1
    assert dt < 10.0, f"native preprocessing too slow: {dt}s for {P} pixels"
