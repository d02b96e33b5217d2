"""Rust-interchange kit determinism (PARITY.md "Verifying against the
Rust reference"; BASELINE.md target #3's executable half).

Re-emits the fixture and asserts every artifact hash matches the
committed expectation — if this drifts, either a preprocess/tile-tree
change was intentional (re-freeze with ``tools/rust_interchange.py
--freeze`` and say so in the commit) or determinism broke.
"""

import json
import tempfile
from pathlib import Path

from tools.rust_interchange import EXPECTED, emit


class TestInterchangeKit:
    def test_emit_matches_committed_hashes(self):
        want = json.loads(EXPECTED.read_text())
        with tempfile.TemporaryDirectory() as tmp:
            got = emit(Path(tmp) / "kit", verbose=False)
        assert got == want, {
            k: (want.get(k), got.get(k))
            for k in set(want) | set(got)
            if want.get(k) != got.get(k)
        }

    def test_comparators_pass_on_self(self):
        from tools.rust_interchange import compare_tc, compare_tiles

        with tempfile.TemporaryDirectory() as tmp:
            emit(Path(tmp) / "kit", verbose=False)
            tc = Path(tmp) / "kit/assets/terrains/interchange/config.tc"
            tiles = Path(tmp) / "kit/assets/terrains/interchange/data/height"
            assert compare_tc(tc, tc) == 0
            assert compare_tiles(tiles, tiles) == 0
