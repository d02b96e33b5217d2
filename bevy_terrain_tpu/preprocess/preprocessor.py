"""Offline dataset preprocessing: source imagery -> streamed tile store.

Behavioral twin of the reference's preprocess task graph
(/root/reference/src/preprocess/preprocessor.rs): per dataset, SPLIT all
tiles of the finest lod from the source image, then DOWNSAMPLE coarser lods
(children -> parent), then per lod STITCH borders from the 8 neighbours and
SAVE to disk; the spherical variant runs per cube face with cross-face
stitching (preprocessor.rs:234-343). Barriers separate the phases.

TPU-first differences: tasks are processed in whole-lod batches instead of
32-GPU-write-slot chunks (SURVEY.md section 2.2), the split resample runs
as device matmuls over the full lod mosaic (ops/preprocess.py), and there
is no GPU readback machinery — results are host arrays that enter the
atlas's normal save path (bounded save slots, async writes,
tile_atlas.rs:318-345 semantics).
"""

from __future__ import annotations

import dataclasses
import shutil
import time
from pathlib import Path
from typing import Optional

import numpy as np

from bevy_terrain_tpu.math.coordinate import TileCoordinate
from bevy_terrain_tpu.ops.preprocess import (
    _resize_cols,
    _resize_rows,
    downsample_tile,
    extract_tile_from_mosaic,
    split_mosaic,
    stitch_tile,
)
from bevy_terrain_tpu.terrain_data.tile_atlas import AtlasTileAttachment, TileAtlas


def reset_directory(directory) -> None:
    """Clear an attachment's data directory + the config.tc manifest
    (reference preprocessor.rs:18-22)."""
    directory = Path(directory)
    tc = directory.parent.parent / "config.tc"
    tc.unlink(missing_ok=True)
    shutil.rmtree(directory, ignore_errors=True)
    directory.mkdir(parents=True, exist_ok=True)


@dataclasses.dataclass
class PreprocessDataset:
    """One planar source image covering a uv region of one cube side
    (reference preprocessor.rs:35-55)."""

    attachment_index: int = 0
    path: str = ""
    side: int = 0
    top_left: tuple[float, float] = (0.0, 0.0)
    bottom_right: tuple[float, float] = (1.0, 1.0)
    lod_range: range = dataclasses.field(default_factory=lambda: range(0, 1))

    def overlapping_tiles(self, lod: int):
        """Tiles of a lod intersecting the dataset region
        (reference preprocessor.rs:58-67)."""
        count = TileCoordinate.count(lod)
        lx = int(self.top_left[0] * count)
        ly = int(self.top_left[1] * count)
        ux = int(np.ceil(self.bottom_right[0] * count))
        uy = int(np.ceil(self.bottom_right[1] * count))
        for x in range(lx, ux):
            for y in range(ly, uy):
                yield TileCoordinate(self.side, lod, x, y)


@dataclasses.dataclass
class SphericalDataset:
    """Six per-face source images (reference preprocessor.rs:29-33)."""

    attachment_index: int
    paths: list[str]
    lod_range: range


class Preprocessor:
    """Builds and runs the preprocess task graph for one terrain
    (reference preprocessor.rs:213-343 + select_ready_tasks :346-399).

    Usage mirrors the reference examples (examples/preprocess_planar.rs)::

        Preprocessor(atlas).clear_attachment(0).preprocess_tile(dataset).run()
    """

    def __init__(self, tile_atlas: TileAtlas, loader=None,
                 device: Optional[bool] = None, batch_tiles: int = 256,
                 naive: bool = False, readback: Optional[str] = None):
        """``device=True`` runs split/downsample/stitch as jitted whole-lod
        stack ops (ops/preprocess_device.py — SURVEY section 2.3's
        device-code commitment); ``device=False`` keeps the per-tile host
        numpy oracles. Both produce byte-identical .bin artifacts (see
        tests/test_preprocess_device.py). Default (None) auto-selects: the
        device path needs the stitched stacks back on the host for saving,
        so it is only chosen when the D2H link is healthy
        (utils/transfer.d2h_is_fast — tunneled test rigs measure ~50 KB/s
        readback and must preprocess on host). ``batch_tiles`` bounds the
        device stack size at deep lods.

        ``naive=True`` pins the single-thread numpy CPU-reference oracle
        (dense tent-matmul split, numpy downsample, no native helpers) —
        the baseline the BASELINE.md >10x preprocess target is measured
        against. Output stays byte-identical to every other path.

        ``readback`` (device path only) selects how stitched tiles return
        to the host: ``"full"`` pulls whole stitched stacks (right when
        D2H runs at bus speed); ``"delta"`` keeps split/downsample
        interiors host-side (fast C++ path, bit-identical to the device
        ops) and pulls ONLY the stitched border strips (~1.5% of the
        bytes — stitch never writes interiors, stitch.wgsl:58-67). Default
        auto-selects by D2H link health."""
        if naive:
            device = False
        if device is None:
            import jax

            from bevy_terrain_tpu.utils.transfer import d2h_is_fast, dispatch_is_fast

            # The device pipeline syncs once per lod stack and streams the
            # stitched results home, so it only wins when a real
            # accelerator is attached AND both the readback link and the
            # dispatch round trip run at bus speed; tunneled rigs fail a
            # probe and must stay on the C++ host path (which the
            # compute-only 13.3x device margin cannot recover at 25-30 ms
            # per sync). On a cpu-only backend the jitted stack ops ARE
            # host compute, and strictly slower than the C++ pipeline
            # (measured 38 vs 330 tiles/s) — the device path there exists
            # for parity tests (device=True explicitly).
            device = (
                jax.default_backend() != "cpu"
                and d2h_is_fast()
                and dispatch_is_fast()
            )
        if readback is None and device:
            from bevy_terrain_tpu.utils.transfer import d2h_is_fast

            readback = "full" if d2h_is_fast() else "delta"
        self.readback = readback or "full"
        self.atlas = tile_atlas
        self.loader = loader or _default_loader
        self.device = device
        self.naive = naive
        self.batch_tiles = batch_tiles
        self._jobs: list = []
        self.start_time: Optional[float] = None

    # -- graph construction --

    def clear_attachment(self, attachment_index: int) -> "Preprocessor":
        """Reference preprocessor.rs:290-296."""
        attachment = self.atlas.attachments[attachment_index]
        self.atlas.state.existing_tiles.clear()
        reset_directory(attachment.path)
        return self

    def preprocess_tile(self, dataset: PreprocessDataset) -> "Preprocessor":
        """Queue split+downsample then per-lod stitch+save
        (reference preprocessor.rs:298-312)."""
        self._jobs.append(("planar", dataset))
        return self

    def preprocess_spherical(self, dataset: SphericalDataset) -> "Preprocessor":
        """Reference preprocessor.rs:314-343: six per-side datasets, split+
        downsample all sides first, then stitch+save lod by lod (cross-face
        borders need all sides split)."""
        self._jobs.append(("spherical", dataset))
        return self

    # -- execution --

    def run(self, verbose: bool = True) -> None:
        self.start_time = time.time()
        for kind, dataset in self._jobs:
            if kind == "planar":
                self._split_and_downsample(dataset)
                for lod in dataset.lod_range:
                    self._stitch_and_save_layer(dataset, lod)
            else:
                sides = [
                    PreprocessDataset(
                        attachment_index=dataset.attachment_index,
                        path=dataset.paths[side],
                        side=side,
                        lod_range=dataset.lod_range,
                    )
                    for side in range(6)
                ]
                for side_dataset in sides:
                    self._split_and_downsample(side_dataset)
                for lod in dataset.lod_range:
                    for side_dataset in sides:
                        self._stitch_and_save_layer(side_dataset, lod)
        self._drain_saves()
        self._dev_stacks = {}  # free device memory between jobs
        self.atlas.save_tile_config()
        if verbose:
            import sys

            print(
                f"Preprocessing took {time.time() - self.start_time:.2f}s",
                file=sys.stderr,
            )
        self._jobs.clear()

    # -- phases (reference preprocessor.rs:234-288) --

    def _attachment(self, dataset):
        return self.atlas.attachments[dataset.attachment_index]

    def _data(self, attachment, coordinate) -> Optional[np.ndarray]:
        index = self.atlas.state.tile_states.get(coordinate)
        return attachment.data[index.atlas_index] if index is not None else None

    def _split_and_downsample(self, dataset: PreprocessDataset) -> None:
        if self.device and self.readback == "full":
            return self._split_and_downsample_device(dataset)
        # device "delta" mode intentionally runs the HOST split/downsample
        # (bit-identical to the device stack ops) so interiors never need
        # to cross the degraded D2H link
        attachment = self._attachment(dataset)
        cfg = attachment.config
        source = self.loader(dataset.path, cfg)

        lods = list(dataset.lod_range)[::-1]
        finest = lods[0]
        mosaic, valid = split_mosaic(
            source, finest, cfg.center_size, dataset.top_left,
            dataset.bottom_right, naive=self.naive,
        )
        # quantize the whole mosaic once (bit-identical to the per-tile
        # formula; C++ single pass) so extraction is a plain slice copy
        quantized = None
        dtype = np.dtype(cfg.format.dtype)
        if not self.naive and dtype in (np.uint8, np.uint16):
            from bevy_terrain_tpu import native as _native

            if _native.available():
                quantized = _native.quantize(mosaic, cfg.format.max_value, dtype)
        for c in dataset.overlapping_tiles(finest):
            atlas_index = self.atlas.state.get_or_allocate_tile(c)
            existing = attachment.data[atlas_index]
            tile = extract_tile_from_mosaic(
                mosaic, valid, c.x, c.y, cfg.texture_size, cfg.border_size,
                cfg.format.dtype, cfg.format.max_value, existing,
                quantized=quantized,
            )
            attachment.data[atlas_index] = tile

        from bevy_terrain_tpu.ops.preprocess import downsample_tile_numpy

        downsample = downsample_tile_numpy if self.naive else downsample_tile
        for lod in lods[1:]:
            for c in dataset.overlapping_tiles(lod):
                children = [
                    self._data(attachment, child) for child in c.children()
                ]
                atlas_index = self.atlas.state.get_or_allocate_tile(c)
                attachment.data[atlas_index] = downsample(
                    children, cfg.texture_size, cfg.border_size
                )

    # -- device phases (jitted lod-stack ops, ops/preprocess_device.py) --

    def _split_and_downsample_device(self, dataset: PreprocessDataset) -> None:
        """Split + downsample as device stack ops; per-lod stacks stay
        device-resident (quantized f32) until the stitch phase pulls them.

        Mirrors the reference's GPU compute passes (preprocess/mod.rs:143-218)
        with whole-lod batches instead of 32-write-slot chunks.
        """
        import jax
        import jax.numpy as jnp

        from bevy_terrain_tpu.ops import preprocess_device as ppd
        from bevy_terrain_tpu.ops.preprocess import _tent_matrix

        attachment = self._attachment(dataset)
        cfg = attachment.config
        source = self.loader(dataset.path, cfg)
        H, W, C = source.shape
        ts, b, center = cfg.texture_size, cfg.border_size, cfg.center_size
        max_value = cfg.format.max_value

        lods = list(dataset.lod_range)[::-1]
        finest = lods[0]
        count = 1 << finest
        P = count * center

        # source positions of mosaic texels (split.wgsl:28-33 inverse_mix)
        uv = (np.arange(P, dtype=np.float64) + 0.5) / P
        tlx, tly = dataset.top_left
        brx, bry = dataset.bottom_right
        px = ((uv - tlx) / (brx - tlx)) * W - 0.5
        py = ((uv - tly) / (bry - tly)) * H - 0.5
        mx = jnp.asarray(_tent_matrix(px, W))
        src_dev = jnp.asarray(source, jnp.float32)
        nz = source[..., 0] != 0
        x0 = np.clip(np.floor(px).astype(np.int64), 0, W - 1)
        x1 = np.clip(x0 + 1, 0, W - 1)
        y0 = np.clip(np.floor(py).astype(np.int64), 0, H - 1)
        y1 = np.clip(y0 + 1, 0, H - 1)

        coords = list(dataset.overlapping_tiles(finest))
        rows_present = sorted({c.y for c in coords})
        band_tiles, band_valid, row_of = [], [], {}
        for ty in rows_present:
            my = jnp.asarray(_tent_matrix(py[ty * center:(ty + 1) * center], H))
            band = _resize_rows(my, src_dev)  # (center, W, C)
            band = _resize_cols(band, mx)  # (center, P, C)
            # validity: the reference's 4-tap textureGather nodata test
            vy0, vy1 = nz[y0[ty * center:(ty + 1) * center]], nz[y1[ty * center:(ty + 1) * center]]
            valid = vy0[:, x0] & vy0[:, x1] & vy1[:, x0] & vy1[:, x1]
            quant = jnp.clip(jnp.rint(band * max_value), 0, max_value)
            tiles_row = jnp.transpose(
                quant.reshape(center, count, center, C), (1, 0, 2, 3)
            )
            tiles_row = jnp.pad(tiles_row, ((0, 0), (b, b), (b, b), (0, 0)))
            row_of[ty] = len(band_tiles)
            band_tiles.append(tiles_row)
            band_valid.append(valid.reshape(center, count, center).transpose(1, 0, 2))
        # invalid texels keep existing data (split.wgsl:19-42); borders zero
        stack_rows = []
        for c in coords:
            t = band_tiles[row_of[c.y]][c.x]
            v = jnp.pad(
                jnp.asarray(band_valid[row_of[c.y]][c.x][..., None]),
                ((b, b), (b, b), (0, 0)),
            )
            prior = self._data(attachment, c)
            keep = (
                jnp.asarray(prior.astype(np.float32))
                if prior is not None else jnp.zeros_like(t)
            )
            stack_rows.append(jnp.where(v, t, keep))
        stack = jnp.stack(stack_rows) if coords else None
        for c in coords:
            self.atlas.state.get_or_allocate_tile(c)
        key = (dataset.attachment_index, dataset.side)
        self._dev_stacks = getattr(self, "_dev_stacks", {})
        self._dev_stacks[key + (finest,)] = (coords, stack)

        for lod in lods[1:]:
            child_coords, child_stack = self._dev_stacks[key + (lod + 1,)]
            child_index = {c: i for i, c in enumerate(child_coords)}
            coords_l = list(dataset.overlapping_tiles(lod))
            idx = np.full((len(coords_l), 4), -1, np.int32)
            for i, c in enumerate(coords_l):
                for q, ch in enumerate(c.children()):
                    idx[i, q] = child_index.get(ch, -1)
            parents = ppd.downsample_stack(
                child_stack, jnp.asarray(idx), ts, b)
            parents = jnp.rint(parents)  # host downsample_tile quantizes
            for c in coords_l:
                self.atlas.state.get_or_allocate_tile(c)
            self._dev_stacks[key + (lod,)] = (coords_l, parents)

    def _stitch_and_save_layer_device(self, dataset: PreprocessDataset, lod: int) -> None:
        import jax
        import jax.numpy as jnp

        from bevy_terrain_tpu.ops import preprocess_device as ppd

        attachment = self._attachment(dataset)
        cfg = attachment.config
        spherical = self.atlas.model.is_spherical
        ai = dataset.attachment_index
        coords, stack = self._dev_stacks.get(
            (ai, dataset.side, lod), (None, None))
        if not coords:
            return
        index_of = {c: i for i, c in enumerate(coords)}

        # cross-face neighbours live in other sides' stacks: append their
        # rows after the stitched block (stitch_stack reads past Nst)
        extra_rows = []
        for c in coords:
            for n in c.neighbours(spherical):
                if not n.is_valid or n in index_of:
                    continue
                other = self._dev_stacks.get((ai, n.side, lod))
                if other is None:
                    continue
                o_coords, o_stack = other
                try:
                    row = o_coords.index(n)
                except ValueError:
                    continue
                index_of[n] = len(coords) + len(extra_rows)
                extra_rows.append(o_stack[row])
        full = (
            jnp.concatenate([stack, jnp.stack(extra_rows)], axis=0)
            if extra_rows else stack
        )
        nbr_idx, nbr_side = ppd.stitch_plan(coords, index_of, spherical)
        stitched = ppd.stitch_stack(
            full, np.array([c.side for c in coords]),
            jnp.asarray(nbr_idx), nbr_side, cfg.border_size, spherical,
        )
        # cast on device before the pull: halves the D2H volume and is
        # the attachment dtype anyway
        host = np.asarray(jax.device_get(stitched.astype(cfg.format.dtype)))
        for i, c in enumerate(coords):
            state = self.atlas.state.tile_states[c]
            attachment.data[state.atlas_index] = host[i]
            self.atlas.state.to_save.append(
                AtlasTileAttachment(c, state.atlas_index, ai)
            )
        self._pump_saves()

    def _stitch_and_save_layer_delta(self, dataset: PreprocessDataset,
                                     lod: int) -> None:
        """Device stitch with border-delta readback: upload the lod's
        pre-stitch tiles (H2D is the healthy direction), stitch on device,
        pull ONLY the border strips and splice them into the host-known
        interiors. Byte-identical to the host stitch (parity-tested)."""
        import jax
        import jax.numpy as jnp

        from bevy_terrain_tpu.ops import preprocess_device as ppd

        attachment = self._attachment(dataset)
        cfg = attachment.config
        spherical = self.atlas.model.is_spherical
        ai = dataset.attachment_index
        coords = [
            c for c in dataset.overlapping_tiles(lod)
            if self._data(attachment, c) is not None
        ]
        if not coords:
            return
        index_of = {c: i for i, c in enumerate(coords)}
        rows = [self._data(attachment, c) for c in coords]
        extra = []
        for c in coords:
            for n in c.neighbours(spherical):
                if (not n.is_valid or n in index_of
                        or n not in self.atlas.state.existing_tiles):
                    continue
                d = self._data(attachment, n)
                if d is None:
                    continue
                index_of[n] = len(coords) + len(extra)
                extra.append(d)
        full = jnp.asarray(np.stack(rows + extra).astype(np.float32))
        nbr_idx, nbr_side = ppd.stitch_plan(coords, index_of, spherical)
        stitched = ppd.stitch_stack(
            full, np.array([c.side for c in coords]),
            jnp.asarray(nbr_idx), nbr_side, cfg.border_size, spherical,
        )
        strips = ppd.extract_borders(
            stitched.astype(cfg.format.dtype), cfg.border_size
        )
        host_strips = np.asarray(jax.device_get(strips))  # ~1.5% of bytes
        for i, c in enumerate(coords):
            state = self.atlas.state.tile_states[c]
            tile = attachment.data[state.atlas_index].copy()
            ppd.composite_borders(tile, host_strips[i], cfg.border_size)
            attachment.data[state.atlas_index] = tile
            self.atlas.state.to_save.append(
                AtlasTileAttachment(c, state.atlas_index, ai)
            )
        self._pump_saves()

    def _stitch_and_save_layer(self, dataset: PreprocessDataset, lod: int) -> None:
        if self.device and self.readback == "delta":
            return self._stitch_and_save_layer_delta(dataset, lod)
        if self.device:
            return self._stitch_and_save_layer_device(dataset, lod)
        attachment = self._attachment(dataset)
        spherical = self.atlas.model.is_spherical
        stitched = {}
        for c in dataset.overlapping_tiles(lod):
            tile = self._data(attachment, c)
            if tile is None:
                continue
            neighbours = []
            for n in c.neighbours(spherical):
                if not n.is_valid or n not in self.atlas.state.existing_tiles:
                    neighbours.append((0, None))
                else:
                    neighbours.append((n.side, self._data(attachment, n)))
            stitched[c] = stitch_tile(tile, c.side, neighbours, attachment.config.border_size)
        # write back after the whole layer is stitched (the reference's
        # barrier between stitch and save, preprocessor.rs:282) then save
        for c, tile in stitched.items():
            state = self.atlas.state.tile_states[c]
            attachment.data[state.atlas_index] = tile
            self.atlas.state.to_save.append(
                AtlasTileAttachment(c, state.atlas_index, dataset.attachment_index)
            )
        self._pump_saves()

    def _pump_saves(self) -> None:
        state = self.atlas.state
        while state.save_slots > 0 and state.to_save:
            tile = state.to_save.popleft()
            self.atlas.attachments[tile.attachment_index].start_saving(
                self.atlas.io_pool, tile
            )
            state.save_slots -= 1

    def _drain_saves(self) -> None:
        while True:
            self._pump_saves()
            pending = any(a.saving for a in self.atlas.attachments)
            for a in self.atlas.attachments:
                a.update(self.atlas.state)
            if not pending and not self.atlas.state.to_save:
                break
            time.sleep(0.005)


def _default_loader(path: str, attachment_config) -> np.ndarray:
    """Load a source image as (H, W, C) float32 in [0, 1] (0 == nodata)."""
    from bevy_terrain_tpu.formats.tiff import load_source_image

    return load_source_image(path, attachment_config)
