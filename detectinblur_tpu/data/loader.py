"""Host-side batch loader with thread prefetch.

Replaces DataLoader + DistributedSampler + GroupedBatchSampler
(train.py:186-215): per-host id sharding, per-epoch reshuffle
(set_epoch semantics), orientation bucketing, ``num_workers`` decode/augment
threads (the DataLoader worker-pool equivalent — image decode and AugMix
release the GIL), and background assembly of fixed-shape BlurBatch structs
so the device never waits on image decode.

Per-item randomness (AugMix, hflip, blur decision) is drawn from an RNG
keyed on (seed, epoch, host, position-in-epoch), so batches are bit-identical
for any worker count and any prefetch depth.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from detectinblur_tpu.data.batching import (
    DEFAULT_SOURCE_BUCKETS,
    build_blur_batch,
    hflip_item,
    pick_bucket,
)
from detectinblur_tpu.data.blur_sampling import BlurPolicy, sample_blur_decision


class DetectionLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        policy: Optional[BlurPolicy] = None,
        psf_bank: Optional[np.ndarray] = None,
        shuffle: bool = True,
        hflip_prob: float = 0.0,
        source_buckets: Optional[Sequence[Tuple[int, int]]] = None,
        seed: int = 1337,
        max_gt: int = 100,
        num_processes: int = 1,
        process_index: int = 0,
        prefetch: int = 2,
        drop_last: bool = True,
        augmix: Optional[dict] = None,
        num_workers: int = 0,
    ):
        """``augmix``: kwargs for data.augmix.augment_and_mix (positional,
        modify_target_boxes, ...) — the --non_pos_aug_mix /
        --include_pos_aug_mix / --aug_mix_target_expand flags."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.policy = policy or BlurPolicy(prob=0.0)
        self.psf_bank = psf_bank
        self.shuffle = shuffle
        self.hflip_prob = hflip_prob
        if source_buckets is None:
            # Resolved at runtime so tests can patch the module default.
            from detectinblur_tpu.data import batching

            source_buckets = batching.DEFAULT_SOURCE_BUCKETS
        self.buckets = tuple(source_buckets)
        self.seed = seed
        self.max_gt = max_gt
        self.num_processes = num_processes
        self.process_index = process_index
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.augmix = augmix
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_processes <= 1:
            return idx
        # Per-host contiguous shard, padded to ceil(n/P) by wrapping around
        # like torch's DistributedSampler (indices += indices[:pad]) so the
        # union of shards covers EVERY dataset item — without the pad up to
        # P-1 val images would never be evaluated and mAP would silently
        # deflate. Duplicated images are dedup'd at the eval merge
        # (coco_eval.py:182-201 dedups by unique img id).
        per = -(-n // self.num_processes)
        pad = per * self.num_processes - n
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.process_index * per : (self.process_index + 1) * per]

    def __len__(self):
        return len(self._epoch_indices()) // self.batch_size

    def _prepare(self, pos: int, index: int):
        """Fetch + augment one item with its own (seed, epoch, host, pos) RNG.

        Self-contained so a worker pool can run many concurrently with
        results identical to the sequential path."""
        rng = np.random.default_rng(
            [abs(self.seed + self.epoch), self.process_index, pos])
        bank_size = self.psf_bank.shape[2] if self.psf_bank is not None else 1
        item = self.dataset[int(index)]
        if self.augmix is not None:
            from detectinblur_tpu.data.augmix import augment_and_mix

            mixed, boxes, masks = augment_and_mix(
                item["image"], rng, boxes=item["boxes"],
                masks=item.get("masks"), **self.augmix)
            item = dict(item, image=mixed,
                        boxes=boxes if boxes is not None else item["boxes"])
            if masks is not None:
                item["masks"] = masks
        if self.hflip_prob > 0 and rng.random() < self.hflip_prob:
            item = hflip_item(item)
        h, w = item["image"].shape[:2]
        bucket = pick_bucket(h, w, self.buckets)
        # Oversized images are top-left-cropped to the largest
        # bucket; GT boxes are clipped to the crop and boxes left
        # degenerate by it are dropped.
        if h > bucket[0] or w > bucket[1]:
            item = dict(item, image=item["image"][: bucket[0], : bucket[1]])
            if len(item["boxes"]):
                boxes = item["boxes"].copy()
                boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, bucket[1])
                boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, bucket[0])
                keep = ((boxes[:, 2] > boxes[:, 0])
                        & (boxes[:, 3] > boxes[:, 1]))
                item["boxes"] = boxes[keep]
                for k in ("labels", "area", "iscrowd", "keypoints"):
                    if k in item:
                        item[k] = item[k][keep]
                if "masks" in item:
                    item["masks"] = item["masks"][keep, : bucket[0],
                                                  : bucket[1]]
            elif "masks" in item:
                item["masks"] = item["masks"][:, : bucket[0], : bucket[1]]
        if item.get("pre_blurred"):
            # Natural-blur images pass through the blur stage
            # untouched (transforms.py:225-235).
            from detectinblur_tpu.data.blur_sampling import BlurDecision

            dec = BlurDecision(False, -1, -1, 0)
        else:
            dec = sample_blur_decision(rng, self.policy, bank_size)
        return item, dec, bucket

    def _prepared_items(self) -> Iterator:
        """Yield prepared (item, dec, bucket) in epoch order, fanning the
        per-item work over ``num_workers`` threads when asked (image decode,
        AugMix, and PSF-bank reads all release the GIL)."""
        indices = self._epoch_indices()
        if self.num_workers <= 1:
            for pos, i in enumerate(indices):
                yield self._prepare(pos, int(i))
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = self.num_workers * 2
            futures: "queue.SimpleQueue" = queue.SimpleQueue()
            it = iter(enumerate(indices))
            in_flight = 0
            for pos, i in it:
                futures.put(pool.submit(self._prepare, pos, int(i)))
                in_flight += 1
                if in_flight == window:
                    break
            while in_flight:
                yield futures.get().result()
                in_flight -= 1
                for pos, i in it:
                    futures.put(pool.submit(self._prepare, pos, int(i)))
                    in_flight += 1
                    break

    def _produce(self, out_q: "queue.Queue"):
        pending: Dict[Tuple[int, int], List] = {b: [] for b in self.buckets}
        try:
            for item, dec, bucket in self._prepared_items():
                pending[bucket].append((item, dec))
                if len(pending[bucket]) == self.batch_size:
                    items, decs = zip(*pending[bucket])
                    out_q.put((build_blur_batch(
                        list(items), list(decs), self.psf_bank, bucket,
                        self.max_gt,
                        bucket_gt=self.num_processes == 1), bucket,
                               [it["image_id"] for it in items]))
                    pending[bucket] = []
            if not self.drop_last:
                for bucket, lst in pending.items():
                    if lst:
                        items, decs = zip(*lst)
                        out_q.put((build_blur_batch(
                            list(items), list(decs), self.psf_bank, bucket,
                            self.max_gt,
                            bucket_gt=self.num_processes == 1), bucket,
                                   [it["image_id"] for it, _ in lst]))
        finally:
            out_q.put(None)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            got = q.get()
            if got is None:
                break
            yield got
