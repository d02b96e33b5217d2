"""Committed golden fixtures: node selections + strip-order mesh buffers.

The cross-round regression anchor for SURVEY section 4's bit-comparability
north star (tools/make_goldens.py writes them; regenerate only on
INTENTIONAL node-selection/mesh changes). Node lists are integers and must
match EXACTLY; mesh buffers are f32 XLA products compared at a tolerance
far below any geometric change (1e-3 of the 100 m height range).
"""

import tempfile
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"


def _load(name):
    p = GOLDEN_DIR / f"{name}.npz"
    if not p.exists():
        pytest.fail(f"missing committed golden {p}; run tools/make_goldens.py")
    return np.load(p)


class TestNodeSelectionGoldens:
    @pytest.mark.parametrize(
        "case", ["nodes_planar_overview", "nodes_planar_ground", "nodes_sphere_approach"]
    )
    def test_exact_node_match(self, case):
        from tools.make_goldens import node_selection_cases, refine_nodes

        spec = {name: (m, v, l) for name, m, v, l in node_selection_cases()}
        model, view, lods = spec[case]
        got = refine_nodes(model, view, lods)
        want = _load(case)["nodes"]
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_array_equal(got, want)


class TestMeshGolden:
    def test_streamed_mesh_matches(self):
        from tools.make_goldens import mesh_case

        with tempfile.TemporaryDirectory() as tmp:
            nodes, heights, positions = mesh_case(Path(tmp))
        g = _load("mesh_planar_streamed")
        np.testing.assert_array_equal(nodes, g["nodes"])
        np.testing.assert_allclose(heights, g["heights"], atol=1e-3)
        np.testing.assert_allclose(positions, g["positions"], atol=1e-3)
