"""Rust-interchange verification kit (BASELINE.md target #3).

cargo does not exist in this image, so the "bit-comparable vs the Rust
reference" north star is verified through the ON-DISK INTERCHANGE both
engines share: ``assets/{path}/config.tc`` (bincode-2 varint, reference
src/formats/mod.rs:8-36) and raw ``.bin`` tile payloads (reference
src/terrain_data/tile_atlas.rs:77-149). This script makes that check one
``cargo test`` away for anyone with the reference checked out:

1. ``--emit DIR`` writes a fully deterministic fixture:
   * ``source/height.png`` — a 1024^2 16-bit source built from f64
     POLYNOMIAL arithmetic only (IEEE +,*,/ are bit-identical on every
     platform; no transcendentals), so the committed hashes reproduce
     anywhere;
   * ``assets/terrains/interchange/`` — our preprocess output for the
     reference-shaped config below (config.tc + per-tile .bin);
   * ``requests_pose{i}.csv`` — the CPU quadtree request scan
     (TileTree::compute_requests twin) for three fixed camera poses from
     fresh state, plus pose0->pose1 transition request/release lists;
   * ``MANIFEST.json`` — sha256 of every artifact.
2. ``--check`` re-emits into a temp dir and diffs every hash against the
   committed ``tools/interchange_expected.json`` — proving OUR side is
   deterministic before anyone compares against Rust.
3. ``--freeze`` records the current emit as the committed expectation.
4. ``--compare-tc A B`` / ``--compare-tiles DIRA DIRB`` diff a Rust-made
   dataset against ours: config.tc as tile SETS (the reference serializes
   a HashSet, so byte order is not stable across runs — formats/mod.rs:8
   + tile_atlas.rs:605-612), .bin payloads per-texel with an lsb
   histogram (GPU bilinear vs our exact path may differ by 1 quantization
   lsb at half-texel ties).

The cargo-side replay steps live in PARITY.md ("Verifying against the
Rust reference"); the Rust test body is written by ``--emit`` into
``DIR/replay_interchange.rs`` so it always matches the fixture constants.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

EXPECTED = Path(__file__).resolve().parent / "interchange_expected.json"

# reference-shaped fixture constants (examples/preprocess_planar.rs scale,
# shrunk to a 3-lod dataset so the kit stays a few MB)
PATH = "terrains/interchange"
TERRAIN_SIZE = 1000.0
HEIGHT = 250.0
TEXTURE_SIZE = 512
BORDER_SIZE = 2
MIP_COUNT = 4
LOD_COUNT = 3
SOURCE_N = 1024
POSES = [
    (120.0, -40.0, -200.0),
    (-380.0, -70.0, 310.0),
    (10.0, 150.0, 20.0),
]


def deterministic_source(n: int = SOURCE_N) -> np.ndarray:
    """u16 height field from f64 polynomial arithmetic only — no libm."""
    x = (np.arange(n, dtype=np.float64) + 0.5) / n
    u, v = np.meshgrid(x, x, indexing="xy")
    # bounded polynomial "terrain": ridges from squared saw ramps
    saw3 = (3.0 * u) % 1.0
    saw5 = (5.0 * v) % 1.0
    saw7 = (7.0 * (u + v) * 0.5) % 1.0
    h = (
        0.30
        + 0.25 * (4.0 * saw3 * (1.0 - saw3))
        + 0.20 * (4.0 * saw5 * (1.0 - saw5)) * u
        + 0.15 * (4.0 * saw7 * (1.0 - saw7)) * (1.0 - v)
        + 0.05 * u * v * (1.0 - u)
    )
    return np.clip(np.rint(h * 65535.0), 0.0, 65535.0).astype(np.uint16)


def _sha(p: Path) -> str:
    return hashlib.sha256(p.read_bytes()).hexdigest()


def emit(outdir: Path, verbose: bool = True) -> dict:
    from PIL import Image

    from bevy_terrain_tpu import (
        AttachmentConfig, AttachmentFormat, PreprocessDataset, Preprocessor,
        TerrainConfig, TerrainModel, TerrainViewConfig,
    )
    from bevy_terrain_tpu.terrain_data import TileAtlas
    from bevy_terrain_tpu.terrain_data.tile_tree import TileTree

    outdir = Path(outdir)
    if outdir.exists():
        shutil.rmtree(outdir)
    (outdir / "source").mkdir(parents=True)
    src = outdir / "source" / "height.png"
    Image.fromarray(deterministic_source()).save(src)

    config = TerrainConfig(
        lod_count=LOD_COUNT,
        model=TerrainModel.planar(np.zeros(3), TERRAIN_SIZE, 0.0, HEIGHT),
        atlas_size=1024,
        path=PATH,
        assets_root=str(outdir / "assets"),
    ).add_attachment(
        AttachmentConfig(
            name="height", texture_size=TEXTURE_SIZE, border_size=BORDER_SIZE,
            mip_level_count=MIP_COUNT, format=AttachmentFormat.R16,
        )
    )
    atlas = TileAtlas(config)
    # host path: deterministic integer-exact C++/numpy pipeline
    Preprocessor(atlas, device=False).clear_attachment(0).preprocess_tile(
        PreprocessDataset(attachment_index=0, path=str(src),
                          lod_range=range(0, LOD_COUNT))
    ).run(verbose=False)

    # request-scan captures: fresh tree per pose + pose0 -> pose1 deltas
    def fmt(tiles):
        rows = sorted((t.side, t.lod, t.x, t.y) for t in tiles)
        return "".join(f"{s},{l},{x},{y}\n" for s, l, x, y in rows)

    vc = TerrainViewConfig()
    for i, pose in enumerate(POSES):
        tree = TileTree(atlas, vc)
        tree.compute_requests(np.asarray(pose, np.float64))
        (outdir / f"requests_pose{i}.csv").write_text(
            "side,lod,x,y\n" + fmt(tree.requested_tiles)
        )
    tree = TileTree(atlas, vc)
    tree.compute_requests(np.asarray(POSES[0], np.float64))
    tree.compute_requests(np.asarray(POSES[1], np.float64))
    (outdir / "transition_requested.csv").write_text(
        "side,lod,x,y\n" + fmt(tree.requested_tiles)
    )
    (outdir / "transition_released.csv").write_text(
        "side,lod,x,y\n" + fmt(tree.released_tiles)
    )

    (outdir / "replay_interchange.rs").write_text(rust_replay_test())

    manifest = {}
    for p in sorted(outdir.rglob("*")):
        if p.is_file() and p.name != "MANIFEST.json":
            manifest[str(p.relative_to(outdir))] = _sha(p)
    (outdir / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))
    if verbose:
        n_tiles = len(atlas.state.existing_tiles)
        print(f"emitted {len(manifest)} artifacts ({n_tiles} tiles) -> {outdir}")
    return manifest


def rust_replay_test() -> str:
    """The cargo-side test body, pinned to the fixture constants above.
    Appended to the reference's src/terrain_data/tile_tree.rs (it needs
    crate-private TileTree::update); see PARITY.md."""
    poses = ",\n        ".join(
        f"DVec3::new({p[0]:.1f}, {p[1]:.1f}, {p[2]:.1f})" for p in POSES
    )
    return f"""\
// Appended to bevy_terrain's src/terrain_data/tile_tree.rs (cargo test
// replay_interchange -- --nocapture). Fixture: rust_interchange.py --emit.
#[cfg(test)]
mod replay_interchange {{
    use super::*;
    use crate::math::TerrainModel;
    use crate::terrain_data::{{AttachmentConfig, AttachmentFormat, TileAtlas}};
    use crate::terrain::TerrainConfig;
    use crate::terrain_view::TerrainViewConfig;
    use bevy::math::DVec3;
    use std::fs;

    const POSES: [DVec3; {len(POSES)}] = [
        {poses},
    ];

    fn write(path: &str, tiles: &mut Vec<TileCoordinate>) {{
        tiles.sort_by_key(|t| (t.side, t.lod, t.x, t.y));
        let mut s = String::from("side,lod,x,y\\n");
        for t in tiles {{
            s += &format!("{{}},{{}},{{}},{{}}\\n", t.side, t.lod, t.x, t.y);
        }}
        fs::write(path, s).unwrap();
    }}

    #[test]
    fn replay_interchange() {{
        // run from the crate root with the emitted fixture's assets/
        // symlinked or copied to ./assets (config.tc + data/height/)
        let config = TerrainConfig {{
            lod_count: {LOD_COUNT},
            model: TerrainModel::planar(DVec3::ZERO, {TERRAIN_SIZE:.1f}, 0.0, {HEIGHT:.1f}),
            atlas_size: 1024,
            path: "{PATH}".to_string(),
            attachments: vec![],
        }}
        .add_attachment(AttachmentConfig {{
            name: "height".to_string(),
            texture_size: {TEXTURE_SIZE},
            border_size: {BORDER_SIZE},
            mip_level_count: {MIP_COUNT},
            format: AttachmentFormat::R16,
        }});
        let atlas = TileAtlas::new(&config);
        let view_config = TerrainViewConfig::default();
        for (i, pose) in POSES.iter().enumerate() {{
            let mut tree = TileTree::new(&atlas, &view_config);
            tree.update(*pose, &atlas);
            write(&format!("requests_pose{{i}}.csv"), &mut tree.requested_tiles.clone());
        }}
        let mut tree = TileTree::new(&atlas, &view_config);
        tree.update(POSES[0], &atlas);
        tree.requested_tiles.clear();
        tree.released_tiles.clear();
        tree.update(POSES[1], &atlas);
        write("transition_requested.csv", &mut tree.requested_tiles.clone());
        write("transition_released.csv", &mut tree.released_tiles.clone());
        // diff the five CSVs against the emitted fixture's: integer tile
        // lists must match EXACTLY (both sides compute f64 host math).
    }}
}}
"""


def compare_tc(a: Path, b: Path) -> int:
    from bevy_terrain_tpu.formats.tc import TC

    ta = {(t.side, t.lod, t.x, t.y) for t in TC.decode(Path(a).read_bytes()).tiles}
    tb = {(t.side, t.lod, t.x, t.y) for t in TC.decode(Path(b).read_bytes()).tiles}
    only_a, only_b = sorted(ta - tb), sorted(tb - ta)
    print(f"{a}: {len(ta)} tiles; {b}: {len(tb)} tiles; "
          f"only-in-a {len(only_a)}, only-in-b {len(only_b)}")
    for t in only_a[:20]:
        print("  only in a:", t)
    for t in only_b[:20]:
        print("  only in b:", t)
    return 0 if not only_a and not only_b else 1


def compare_tiles(da: Path, db: Path, dtype=np.uint16) -> int:
    """Per-texel diff of matching .bin payloads with an lsb histogram."""
    names_a = {p.name for p in Path(da).glob("*.bin")}
    names_b = {p.name for p in Path(db).glob("*.bin")}
    if names_a != names_b:
        print(f"tile SET differs: only-in-a {sorted(names_a - names_b)[:10]} "
              f"only-in-b {sorted(names_b - names_a)[:10]}")
        return 1
    worst, hist = 0, {}
    for name in sorted(names_a):
        va = np.fromfile(Path(da) / name, dtype=dtype).astype(np.int64)
        vb = np.fromfile(Path(db) / name, dtype=dtype).astype(np.int64)
        if va.shape != vb.shape:
            print(f"{name}: SIZE differs {va.shape} vs {vb.shape}")
            return 1
        d = np.abs(va - vb)
        worst = max(worst, int(d.max()))
        for lsb, count in zip(*np.unique(d[d > 0], return_counts=True)):
            hist[int(lsb)] = hist.get(int(lsb), 0) + int(count)
    total = sum(hist.values())
    print(f"{len(names_a)} tiles compared; differing texels {total}; "
          f"max lsb diff {worst}; histogram {dict(sorted(hist.items())[:8])}")
    # byte-exact is the expectation for our own host/device paths; vs the
    # Rust GPU pipeline, half-texel quantization ties may flip 1 lsb
    return 0 if worst <= 1 else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit", metavar="DIR")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--compare-tc", nargs=2, metavar=("A", "B"))
    ap.add_argument("--compare-tiles", nargs=2, metavar=("DIRA", "DIRB"))
    args = ap.parse_args()

    if args.compare_tc:
        sys.exit(compare_tc(*map(Path, args.compare_tc)))
    if args.compare_tiles:
        sys.exit(compare_tiles(*map(Path, args.compare_tiles)))
    if args.emit:
        emit(Path(args.emit))
        return
    if args.freeze or args.check:
        with tempfile.TemporaryDirectory() as tmp:
            manifest = emit(Path(tmp) / "kit")
        if args.freeze:
            EXPECTED.write_text(json.dumps(manifest, indent=1))
            print(f"froze {len(manifest)} hashes -> {EXPECTED}")
            return
        want = json.loads(EXPECTED.read_text())
        bad = {k for k in set(want) | set(manifest)
               if want.get(k) != manifest.get(k)}
        if bad:
            print(f"DETERMINISM BROKEN: {len(bad)} artifacts differ:")
            for k in sorted(bad)[:20]:
                print(f"  {k}: want {want.get(k, '<missing>')[:16]} "
                      f"got {manifest.get(k, '<missing>')[:16]}")
            sys.exit(1)
        print(f"check OK: {len(manifest)} artifacts match the committed hashes")
        return
    ap.print_help()


if __name__ == "__main__":
    main()
