"""Streamed single-pass identify + spot-cut pipeline for out-of-core
movies.

The reference streams ND2/TIFF chunks through a dask gufunc so huge
movies never sit in RAM (picasso/localize.py:958-1086). The TPU-native
equivalent is a double-buffered producer/consumer: a background thread
decodes the next frame chunk from disk while the device identifies the
current one, and the ROIs are cut from the decoded chunk while it is
still hot in RAM — one decode pass over the movie instead of the two
(identify, then get_spots) of the unstreamed path.

Peak host memory is ``prefetch_depth + 1`` chunks (~128 MB each)
plus the accumulated (N, box, box) spot stack — independent of movie
length, so a 100 GB movie localizes in a fixed footprint.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Callable, Literal

import numpy as np
import pandas as pd

from picasso_tpu import lib
from picasso_tpu.ops import identify as _identify_ops

__all__ = ["identify_and_cut", "ChunkPrefetcher"]


class ChunkPrefetcher:
    """Background decoder: reads frame chunks of a (lazy) movie into a
    bounded queue so disk/decode latency overlaps device compute."""

    def __init__(
        self,
        movie,
        chunk_bounds: list[tuple[int, int]],
        depth: int = 2,
    ):
        self.movie = movie
        self.bounds = chunk_bounds
        self.q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self.stop_event = threading.Event()
        self.error: BaseException | None = None
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        try:
            for lo, hi in self.bounds:
                if self.stop_event.is_set():
                    break
                batch = np.asarray(self.movie[lo:hi])
                while not self.stop_event.is_set():
                    try:
                        self.q.put((lo, batch), timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # surfaced in __next__
            self.error = exc
        finally:
            while not self.stop_event.is_set():
                try:
                    self.q.put(None, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is None:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item

    def close(self):
        self.stop_event.set()
        # drain so the producer can exit its put()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self.thread.join(timeout=5)


def _cut_from_chunk(
    batch: np.ndarray,
    f: np.ndarray,
    y: np.ndarray,
    x: np.ndarray,
    frame_offset: int,
    box: int,
) -> np.ndarray:
    """Cut (n, box, box) ROIs from an in-RAM frame chunk."""
    local_f = (f - frame_offset).astype(np.int64)
    from picasso_tpu import native

    if native.AVAILABLE and batch.flags.c_contiguous:
        return native.cut_spots(batch, local_f, x, y, box)
    r = box // 2
    offs = np.arange(-r, r + 1)
    yy = y[:, None, None] + offs[None, :, None]
    xx = x[:, None, None] + offs[None, None, :]
    return batch[local_f[:, None, None], yy, xx]


def identify_and_cut(
    movie,
    minimum_ng: float,
    box: int,
    *,
    roi: tuple[tuple[int, int], tuple[int, int]] | None = None,
    frame_bounds: tuple[int, int] | None = None,
    frame_chunk: int | None = None,
    prefetch_depth: int = 2,
    progress_callback: (
        Callable[[int], None] | Literal["console"] | None
    ) = None,
    abort_callback: Callable[[], bool] | None = None,
) -> tuple[pd.DataFrame | None, np.ndarray | None]:
    """One streamed pass over the movie: identify spots per chunk on
    device while the next chunk decodes in the background, and cut the
    ROIs from the chunk while it is in RAM.

    Returns ``(identifications, spots)`` with spots in the movie's
    native dtype (photon conversion happens on device in the fitters),
    bit-identical to ``localize.identify`` + ``localize.get_spots_raw``
    (reference contract picasso/localize.py:639 + :1115). Returns
    ``(None, None)`` if aborted.
    """
    from picasso_tpu.localize import _id_frame_chunk

    n_frames = len(movie)
    lo_b, hi_b = 0, n_frames
    if frame_bounds is not None:
        # reference's upper bound is inclusive (localize.py:394-401)
        if frame_bounds[0] is not None:
            lo_b = max(frame_bounds[0], 0)
        if frame_bounds[1] is not None:
            hi_b = min(frame_bounds[1], n_frames)
    frames_idx = [f for f in range(n_frames) if lo_b <= f <= hi_b]

    def _empty():
        return pd.DataFrame(
            {
                "frame": np.empty(0, int),
                "x": np.empty(0, int),
                "y": np.empty(0, int),
                "net_gradient": np.empty(0, np.float32),
            }
        )

    first = np.asarray(movie[0])
    if not frames_idx:
        return _empty(), np.zeros((0, box, box), dtype=first.dtype)

    if frame_chunk is None:
        # equal-split chunking: padding the tail chunk uploads dead
        # bytes through the host->device link (the streamed path's
        # bottleneck), so split the movie evenly instead and round to
        # a multiple of 32 frames to bound compile-shape variety
        base = _id_frame_chunk(*first.shape[-2:])
        n_chunks = max(1, -(-len(frames_idx) // base))
        frame_chunk = -(-len(frames_idx) // n_chunks)
        if n_chunks > 1:
            frame_chunk = -(-frame_chunk // 32) * 32
    bounds = [
        (frames_idx[s], frames_idx[
            min(s + frame_chunk, len(frames_idx)) - 1
        ] + 1)
        for s in range(0, len(frames_idx), frame_chunk)
    ]

    all_f, all_y, all_x, all_ng, all_spots = [], [], [], [], []
    prefetcher = ChunkPrefetcher(movie, bounds, depth=prefetch_depth)
    try:
        with lib.progress_reporter(
            progress_callback, len(frames_idx), "Identifying spots"
        ) as rep:
            done = 0
            first_chunk = True
            # software pipeline: chunk k+1 uploads and dispatches on
            # device while chunk k's results are read back and its
            # ROIs are cut on host
            in_flight: deque = deque()

            def _drain():
                nonlocal done
                offset, n_real, padded_tail, batch, handle = (
                    in_flight.popleft()
                )
                f, y, x, ng = (
                    _identify_ops.identify_frames_finalize(handle)
                )
                if padded_tail:
                    keep = f < offset + n_real
                    f, y, x, ng = (
                        f[keep], y[keep], x[keep], ng[keep]
                    )
                spots = _cut_from_chunk(
                    batch, f, y, x, offset, box
                )
                all_f.append(f)
                all_y.append(y)
                all_x.append(x)
                all_ng.append(ng)
                all_spots.append(spots)
                done += n_real
                rep.set_value(done)
                if callable(progress_callback):
                    progress_callback(done)

            for offset, batch in prefetcher:
                if abort_callback is not None and abort_callback():
                    return None, None
                n_real = len(batch)
                padded = batch
                # pad tail chunks so only one batch shape compiles
                # (zero frames produce no identifications)
                pad = frame_chunk - n_real
                padded_tail = pad > 0 and not first_chunk
                if padded_tail:
                    padded = np.concatenate([
                        batch,
                        np.zeros(
                            (pad, *batch.shape[1:]), batch.dtype
                        ),
                    ])
                handle = _identify_ops.identify_frames_dispatch(
                    padded, minimum_ng, box,
                    frame_offset=offset, roi=roi,
                )
                in_flight.append(
                    (offset, n_real, padded_tail, batch, handle)
                )
                first_chunk = False
                while len(in_flight) > 1:
                    _drain()
            while in_flight:
                _drain()
    finally:
        prefetcher.close()

    ids = pd.DataFrame(
        {
            "frame": np.concatenate(all_f).astype(int),
            "x": np.concatenate(all_x).astype(int),
            "y": np.concatenate(all_y).astype(int),
            "net_gradient": np.concatenate(all_ng).astype(np.float32),
        }
    )
    spots = (
        np.concatenate(all_spots)
        if all_spots
        else np.zeros((0, box, box), dtype=first.dtype)
    )
    # identify_frames emits frame-major order per chunk and chunks are
    # consumed in order, so ids/spots are already frame-sorted
    return ids, spots
