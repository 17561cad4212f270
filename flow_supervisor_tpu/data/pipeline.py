"""Host-side training pipelines: load -> augment -> batch -> prefetch.

Replaces the reference's tf.data graphs (``data/flow_dataset.py``) with a plain
Python/numpy pipeline: records are shuffled per epoch, decoded with cv2, run
through the numpy augmentors, batched, and prefetched on a background thread so
host work overlaps device steps (the reference used tf.data prefetch(10),
train.py:117-124).

Stage registry parity (``data/flow_datasets.py:10-68`` + the torch tree's
``wb_data/flow_datasets.py``): each stage composes catalogs with its own
augmentation parameters; ``semi-<unsup>-<sup>`` zips an unlabeled stream with a
``sup_``-prefixed labeled stream (``make_semi_dataset``,
data/flow_dataset.py:360-391).
"""
from __future__ import annotations

import atexit
import queue
import threading
import weakref
from typing import Iterator, Optional

import numpy as np

from flow_supervisor_tpu.data import datasets as D
from flow_supervisor_tpu.data.augment import (
    FlowAugmentor,
    SparseFlowAugmentor,
    UnsupAugmentor,
)
from flow_supervisor_tpu.data.io import read_flow_any, read_image


def load_record(record: D.FlowRecord):
    """-> (img1, img2, flow, valid) float32; dummy zero flow for unlabeled."""
    img1 = read_image(record.images[0])
    img2 = read_image(record.images[1])
    if record.flow is not None:
        flow, valid = read_flow_any(record.flow)
        flow = flow.astype(np.float32)
        if valid is None:
            valid = np.ones(flow.shape[:2] + (1,), np.float32)
        else:
            valid = valid.reshape(valid.shape[:2] + (1,)).astype(np.float32)
    else:
        flow = np.zeros(img1.shape[:2] + (2,), np.float32)
        valid = np.zeros(img1.shape[:2] + (1,), np.float32)
    if record.canonical_size is not None:
        img1 = _crop_or_pad(img1, record.canonical_size)
        img2 = _crop_or_pad(img2, record.canonical_size)
        flow = _crop_or_pad(flow, record.canonical_size)
        valid = _crop_or_pad(valid, record.canonical_size)
    return img1, img2, flow, valid


def _crop_or_pad(x: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """tf.image.resize_with_crop_or_pad semantics: center crop then center pad."""
    h, w = x.shape[:2]
    th, tw = size
    y0 = max(0, (h - th) // 2)
    x0 = max(0, (w - tw) // 2)
    x = x[y0 : y0 + th, x0 : x0 + tw]
    h, w = x.shape[:2]
    py, px = th - h, tw - w
    if py or px:
        x = np.pad(
            x,
            ((py // 2, py - py // 2), (px // 2, px - px // 2), (0, 0)),
        )
    return x


def _stack(dicts: list[dict]) -> dict:
    return {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}


# ---- multi-worker example engine ------------------------------------------
# The reference rode tf.data's C++ thread pool (num_parallel_calls); a single
# Python thread decodes+augments ~1 batch/sec at the semi recipe shapes —
# slower than the train step, i.e. the loader becomes the bottleneck. A
# THREAD pool parallelizes decode+augment: cv2 and the large numpy ops
# release the GIL, and threads avoid the ~20 MB/example pickle IPC that made
# a process pool 3x SLOWER than serial. The parent assembles batches in
# deterministic order with per-example seeds drawn from the pipeline RNG.


def _iter_batches(pipe, workers: int) -> Iterator[dict]:
    """Infinite batch stream over ``pipe.records`` via ``pipe._example_rng``.

    workers <= 1: in-process serial. workers > 1: a thread pool with a
    bounded in-flight window (Pool.imap's feeder would consume an infinite
    job generator unboundedly). Epoch order and per-example seeds always come
    from ``pipe.rng``, so the record sequence is reproducible for any worker
    count (the augmentation stream differs from the serial path only in that
    each example gets its own seeded generator)."""

    def jobs():
        while True:
            for idx in pipe.rng.permutation(len(pipe.records)):
                yield int(idx), int(pipe.rng.integers(0, 2**63))

    def make_example(job):
        idx, seed = job
        return pipe._example_rng(pipe.records[idx], np.random.default_rng(seed))

    if workers <= 1:
        batch = []
        for job in jobs():
            batch.append(make_example(job))
            if len(batch) == pipe.batch_size:
                yield _stack(batch)
                batch = []
        return

    import collections
    from multiprocessing.pool import ThreadPool

    pool = ThreadPool(workers)
    try:
        job_iter = jobs()
        inflight: collections.deque = collections.deque()
        batch = []
        while True:
            while len(inflight) < workers * 2:
                inflight.append(pool.apply_async(make_example, (next(job_iter),)))
            batch.append(inflight.popleft().get())
            if len(batch) == pipe.batch_size:
                yield _stack(batch)
                batch = []
    finally:
        pool.terminate()
        pool.join()


class SupervisedPipeline:
    """Labeled stream -> {'image1','image2','flow','valid'} batches."""

    def __init__(self, records, crop_size, min_scale, max_scale, do_flip,
                 batch_size, seed=1234, augment=True, do_rotation=False,
                 max_rotation=10.0, workers=0):
        assert records, "empty dataset"
        self.records = list(records)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.workers = workers
        self.augment = augment
        self.dense_aug = FlowAugmentor(
            crop_size, min_scale, max_scale, do_flip,
            do_rotation=do_rotation, max_rotation=max_rotation,
        )
        self.sparse_aug = SparseFlowAugmentor(
            crop_size, min_scale, max_scale, do_flip,
            do_rotation=do_rotation, max_rotation=max_rotation,
        )

    def _example_rng(self, record, rng) -> dict:
        img1, img2, flow, valid = load_record(record)
        if not self.augment:
            return {"image1": img1, "image2": img2, "flow": flow, "valid": valid}
        # runtime dense/sparse dispatch mirrors flow_dataset.py:119-143: dense
        # when the valid mask is everywhere positive.
        if record.sparse or not (valid > 0.5).all():
            img1, img2, flow, valid = self.sparse_aug(img1, img2, flow, valid, rng)
        else:
            img1, img2, flow = self.dense_aug(img1, img2, flow, rng)
            valid = np.ones(flow.shape[:2] + (1,), np.float32)
        return {
            "image1": img1.astype(np.float32),
            "image2": img2.astype(np.float32),
            "flow": flow.astype(np.float32),
            "valid": valid.astype(np.float32),
        }

    def __iter__(self) -> Iterator[dict]:
        return _iter_batches(self, self.workers)


class UnsupPipeline:
    """Unlabeled stream -> UnsupAugmentor dict batches (full frame + crop)."""

    def __init__(self, records, crop_size, min_scale, max_scale, do_flip,
                 batch_size, full_size, seed=1234, do_rotation=False,
                 max_rotation=10.0, workers=0):
        assert records, "empty dataset"
        self.records = list(records)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.workers = workers
        self.aug = UnsupAugmentor(
            crop_size, min_scale, max_scale, do_flip, full_size=full_size,
            do_rotation=do_rotation, max_rotation=max_rotation,
        )

    def _example_rng(self, record, rng) -> dict:
        img1, img2, flow, valid = load_record(record)
        return self.aug(img1, img2, flow, valid, rng)

    def __iter__(self) -> Iterator[dict]:
        return _iter_batches(self, self.workers)


class MultiFramePipeline:
    """Frame-triplet stream (reference MultiFrameDataset + MultiFrameAugmentor,
    data/flow_dataset.py:208-254): emits {'image1..3', 'flow1/2', 'valid1/2',
    'orig_image1..3', 'crop_yx'} batches from records with 3 frame paths and a
    (flow_i, flow_i+1) pair."""

    def __init__(self, records, crop_size, min_scale, max_scale, do_flip,
                 batch_size, seed=1234, workers=0):
        assert records, "empty dataset"
        from flow_supervisor_tpu.data.augment import MultiFrameAugmentor

        self.records = list(records)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.workers = workers
        self.aug = MultiFrameAugmentor(crop_size, min_scale, max_scale, do_flip)

    def _example_rng(self, record, rng) -> dict:
        imgs = [read_image(p) for p in record.images]
        assert len(imgs) == 3, "multiframe records need 3 frames"
        h, w = imgs[0].shape[:2]
        if record.flow is not None:
            flow1, valid1 = read_flow_any(record.flow)
            flow1 = flow1.astype(np.float32)
            valid1 = (
                np.ones(flow1.shape[:2] + (1,), np.float32)
                if valid1 is None
                else valid1.reshape(valid1.shape[:2] + (1,)).astype(np.float32)
            )
        else:
            flow1 = np.zeros((h, w, 2), np.float32)
            valid1 = np.zeros((h, w, 1), np.float32)
        # second flow (i+1 -> i+2) rides in extra[2] for labeled triplets
        # (reference SintelMultiFrame flow path pairs, data/sintel.py:60-65);
        # dummy zeros otherwise (the reference's "" paths)
        flow2 = np.zeros((h, w, 2), np.float32)
        valid2 = np.zeros((h, w, 1), np.float32)
        if len(record.extra) > 2 and record.extra[2]:
            flow2, v2 = read_flow_any(record.extra[2])
            flow2 = flow2.astype(np.float32)
            valid2 = (
                np.ones(flow2.shape[:2] + (1,), np.float32)
                if v2 is None
                else v2.reshape(v2.shape[:2] + (1,)).astype(np.float32)
            )
        return self.aug(*imgs, flow1, valid1, flow2, valid2, rng)

    def __iter__(self) -> Iterator[dict]:
        return _iter_batches(self, self.workers)


def semi_zip(unsup_iter, sup_iter) -> Iterator[tuple[dict, dict]]:
    """Zip the two infinite streams (make_semi_dataset semantics)."""
    for unsup_batch, sup_batch in zip(unsup_iter, sup_iter):
        yield sup_batch, unsup_batch


# One module-level atexit hook over a WeakSet: prefetchers (and their queued
# batches) become collectible as soon as callers drop them, instead of being
# pinned for the life of the process by per-instance atexit registrations.
_live_prefetchers: "weakref.WeakSet[Prefetcher]" = weakref.WeakSet()


def _close_live_prefetchers() -> None:
    for p in list(_live_prefetchers):
        p.close()


atexit.register(_close_live_prefetchers)


class Prefetcher:
    """Background-thread prefetch of an iterator (tf.data prefetch equivalent).

    The producer checks a stop flag between bounded puts so interpreter
    teardown never aborts inside a blocking queue op ("terminate called
    without an active exception")."""

    def __init__(self, it: Iterator, depth: int = 4):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()

        def run():
            try:
                for item in it:
                    while not self._stop.is_set():
                        try:
                            self.q.put(item, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on next()
                self._err = e
                try:
                    self.q.put(None, timeout=0.25)
                except queue.Full:
                    pass

        self.t = threading.Thread(target=run, daemon=True)
        self.t.start()
        _live_prefetchers.add(self)

    def close(self):
        """Terminal-only shutdown (drops one queued batch to unblock the
        producer); do not reuse the iterator after calling this."""
        self._stop.set()
        try:  # unblock a producer stuck on a full queue
            self.q.get_nowait()
        except queue.Empty:
            pass
        self.t.join(timeout=2.0)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is None:
            raise self._err if self._err else StopIteration
        return item


# ---- stage registry (reference data/flow_datasets.py + wb_data) ----------

# Per-stage static full_size defaults = the floor-multiple-of-8 of each
# stage's NATIVE source resolution (mixed stages: elementwise min over
# members, so nothing upscales and larger members get random full-frame
# crops, matching _full_size_for's min() semantics). This reproduces the
# reference's dynamic per-dataset full sizes (raft_utils/augmentor.py:665-669
# floor-8 of whatever frame arrives) with XLA-friendly static shapes: the
# upscale-if-smaller fallback (data/augment.py:418-428) never engages, which
# matters — a 1.33x upscale shifts the census loss floor ~+23% and smooth2
# ~+19% on perfect-flow probes (tools/exp_full_size_policy.py, docs/PARITY.md).
FULL_SIZE_DEFAULTS = {
    "chairs": (384, 512),
    "chairs_unsup": (384, 512),
    "things": (536, 960),
    "things_unsup": (536, 960),
    "sintel_unsup_test": (432, 1024),
    "sintel_unsup_train": (432, 1024),  # + Spring (1072, 1920): min -> sintel
    "sintel_unsup_labeled_train": (432, 1024),
    "sintel_unsup_part1": (432, 1024),
    "sintel_unsup_part2": (432, 1024),
    "sintel_multiframe": (432, 1024),
    "kitti_unsup": (368, 1240),  # canonical multiview frame 375x1242
    "kitti_unsup_test": (368, 1240),
    "kitti2015_unsup": (368, 1240),
    "hd1k": (1072, 2560),
    "ctskh": (368, 512),  # min over C(384,512)/T(536,960)/S(432,1024)/K(368,1240)/H
    "davis_unsup": (480, 848),  # DAVIS 480p frames are 480x854
}
GENERIC_FULL_SIZE = (440, 1024)


def resolve_full_size(stage: str, full_size):
    """Explicit config wins; None = the stage's native floor-8 bucket."""
    if full_size is not None:
        return tuple(full_size)
    return FULL_SIZE_DEFAULTS.get(stage, GENERIC_FULL_SIZE)


def stage_records(stage: str):
    """-> (records, aug_param dict) for a stage name."""
    if stage == "chairs":
        return D.flying_chairs(True), dict(min_scale=-0.1, max_scale=1.0, do_flip=True)
    if stage == "things":
        recs = D.flying_things("frames_finalpass") + D.flying_things("frames_cleanpass")
        return recs, dict(min_scale=0.0, max_scale=0.8, do_flip=True)
    if stage == "things_unsup":
        recs = D.flying_things("frames_finalpass") + D.flying_things("frames_cleanpass")
        return recs, dict(min_scale=-0.4, max_scale=0.8, do_flip=True)
    if stage == "sintel_unsup_test":
        recs = []
        for dstype in ("final", "clean"):
            for interval in (1, 2):
                base = (
                    D.sintel(False, dstype)
                    if interval == 1
                    else D.sintel_unsup_interval(False, dstype)
                )
                recs.extend(base)
                recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.5, max_scale=0.6, do_flip=True)
    if stage == "sintel_unsup_train":
        recs = []
        for dstype in ("final", "clean"):
            for interval in (1, 2):
                base = (
                    D.sintel(True, dstype)
                    if interval == 1
                    else D.sintel_unsup_interval(True, dstype)
                )
                recs.extend(base)
                recs.extend(D.backward(base))
        for interval in (1, 2):
            base = D.spring(interval)
            recs.extend(base)
            recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.5, max_scale=0.6, do_flip=True)
    if stage == "kitti_unsup_test":
        recs = []
        for interval in (1, 2):
            base = D.kitti_multiview(False, interval)
            recs.extend(base)
            recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.2, max_scale=0.6, do_flip=True)
    if stage == "kitti_unsup":
        recs = []
        for interval in (1, 2):
            base = D.kitti_multiview(True, interval)
            recs.extend(base)
            recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.2, max_scale=0.6, do_flip=True)
    if stage == "kitti2015_unsup":
        recs = D.kitti(True)
        return recs, dict(min_scale=-0.2, max_scale=0.6, do_flip=True)
    if stage == "sintel_unsup_labeled_train":
        recs = []
        for dstype in ("final", "clean"):
            base = D.sintel(True, dstype)
            recs.extend(base)
            recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.5, max_scale=0.6, do_flip=True)
    if stage in ("sintel_unsup_part1", "sintel_unsup_part2"):
        part = 1 if stage.endswith("1") else 2
        recs = []
        for dstype in ("final", "clean"):
            base = D.sintel_unsup_part(part, dstype)
            recs.extend(base)
            recs.extend(D.backward(base))
        # reference SintelUnsupPart params (data/sintel.py:130-137)
        return recs, dict(min_scale=-0.1, max_scale=1.0, do_flip=True)
    if stage == "sintel_multiframe":
        # frame triplets; consumed by MultiFramePipeline (fetch_dataloader)
        recs = D.sintel_multiframe(True, "final") + D.sintel_multiframe(True, "clean")
        # reference SintelMultiFrame params (data/sintel.py:68-75)
        return recs, dict(min_scale=-0.1, max_scale=1.0, do_flip=True)
    if stage == "hd1k":
        return D.hd1k(), dict(min_scale=-0.1, max_scale=1.0, do_flip=True)
    if stage == "chairs_unsup":
        return D.flying_chairs(True), dict(min_scale=-0.1, max_scale=1.0, do_flip=True)
    if stage == "ctskh":
        # mixed C+T+S+K+H supervised stage (the sup side of the reference's
        # C+T+S+K+H+DAVIS checkpoints, README.md:31-33), with RAFT's standard
        # oversampling: 100x sintel, 200x kitti, 5x hd1k vs 1x things
        recs = []
        things = D.flying_things("frames_cleanpass")
        recs += things
        for dstype in ("clean", "final"):
            recs += D.sintel(True, dstype) * 100
        recs += D.kitti(True) * 200
        recs += D.hd1k() * 5
        return recs, dict(min_scale=-0.2, max_scale=0.6, do_flip=True)
    if stage == "davis_unsup":
        # unlabeled DAVIS frame pairs (the reference's DAVIS semi recipes,
        # README.md:31-33 + samples/README.md), fwd+bwd directions
        import os as _os
        from flow_supervisor_tpu.data import paths as _paths

        recs = []
        frame_root = _os.path.join(_paths.DAVIS, "JPEGImages", "480p")
        scene_dirs = (
            sorted(_os.listdir(frame_root)) if _os.path.isdir(frame_root) else []
        )
        for scene in scene_dirs:
            base = D.frames_directory(_os.path.join(frame_root, scene))
            recs.extend(base)
            recs.extend(D.backward(base))
        return recs, dict(min_scale=-0.5, max_scale=0.6, do_flip=True)
    raise NotImplementedError(f"unknown stage: {stage}")


def fetch_dataloader(train_cfg, seed: Optional[int] = None):
    """Build the pipeline(s) for TrainCfg.stage.

    'semi-<unsup_stage>-<sup_stage>' (train.py:98-115) returns an iterator of
    (sup_batch, unsup_batch); anything else a single supervised/unsup stream.
    """
    seed = train_cfg.seed if seed is None else seed
    stage = train_cfg.stage
    workers = getattr(train_cfg, "loader_workers", 0)
    rot = dict(
        do_rotation=getattr(train_cfg, "do_rotation", False),
        max_rotation=getattr(train_cfg, "max_rotation", 10.0),
    )
    if stage == "sintel_multiframe":
        records, aug = stage_records(stage)
        pipe = MultiFramePipeline(
            records,
            train_cfg.image_size,
            batch_size=train_cfg.batch_size,
            seed=seed,
            workers=workers,
            **aug,
        )
        return Prefetcher(iter(pipe))
    if stage.startswith("semi-"):
        _, unsup_stage, sup_stage = stage.split("-", 2)
        unsup_recs, unsup_aug = stage_records(unsup_stage)
        sup_recs, sup_aug = stage_records(sup_stage)
        sup = UnsupPipeline(
            sup_recs,
            train_cfg.image_size,
            batch_size=train_cfg.batch_size,
            full_size=resolve_full_size(sup_stage, train_cfg.full_size),
            seed=seed,
            workers=workers,
            **sup_aug,
            **rot,
        )
        unsup = UnsupPipeline(
            unsup_recs,
            train_cfg.unsup_image_size,
            batch_size=train_cfg.batch_size,
            full_size=resolve_full_size(unsup_stage, train_cfg.full_size),
            seed=seed + 1,
            workers=workers,
            **unsup_aug,
            **rot,
        )
        return Prefetcher(semi_zip(iter(unsup), iter(sup)))
    records, aug = stage_records(stage)
    if "unsup" in stage:
        # *_unsup stages carry the UnsupDataset dict contract (full-size
        # originals + 8-aligned crop + offsets) in the reference regardless of
        # label presence (data/flow_dataset.py:146-206) — the standalone
        # raft-unsup trainer consumes orig_image*/crop_yx from it.
        pipe = UnsupPipeline(
            records,
            train_cfg.image_size,
            batch_size=train_cfg.batch_size,
            full_size=resolve_full_size(stage, train_cfg.full_size),
            seed=seed,
            workers=workers,
            **aug,
            **rot,
        )
        return Prefetcher(iter(pipe))
    pipe = SupervisedPipeline(
        records,
        train_cfg.image_size,
        batch_size=train_cfg.batch_size,
        seed=seed,
        workers=workers,
        **aug,
        **rot,
    )
    return Prefetcher(iter(pipe))
