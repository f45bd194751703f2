"""Per-host sharded input pipeline with parallel GT encoding + device prefetch.

Replaces the reference's torch ``DataLoader(num_workers, pin_memory) +
DistributedSampler`` stack (SURVEY.md §3.1 host<->worker boundary):

- each host process owns indices ``[shard_id::num_shards]`` of the epoch
  permutation (the DistributedSampler equivalent; shard identity comes from
  ``jax.process_index()`` in multi-host runs);
- GT encoding (numpy/cv2, model-free) runs in a process pool;
- ``prefetch_to_device`` keeps N batches in flight so the TPU never waits on
  the host (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from centerpose_tpu.config import Config
from centerpose_tpu.data.encode import encode_example, stack_batch

# Worker-process globals (set once per worker by _init_worker).
_WORKER_DS = None
_WORKER_CFG = None


def _init_worker(dataset, cfg):
    global _WORKER_DS, _WORKER_CFG
    _WORKER_DS = dataset
    _WORKER_CFG = cfg


def _encode_index(args):
    idx, seed, is_train = args
    rng = np.random.default_rng(seed)
    img, anns = _WORKER_DS.get_raw(idx)
    ex = encode_example(img, anns, _WORKER_CFG, rng, is_train)
    ex.pop("c", None)
    ex.pop("s", None)
    return ex


class DataLoader:
    """Epoch-based loader over any dataset exposing __len__ / get_raw(i)."""

    def __init__(
        self,
        dataset,
        cfg: Config,
        batch_size: int,
        is_train: bool = True,
        num_workers: int = 0,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.is_train = is_train
        self.num_workers = num_workers
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.drop_last = drop_last
        self._pool: Optional[ProcessPoolExecutor] = None

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            import multiprocessing
            import os

            # spawn, not fork: the parent is JAX-multithreaded by the time
            # the pool starts (device backend + prefetch threads), and
            # fork()ing a threaded process can deadlock a worker mid-epoch
            # (observed: a pool wedged after ~17 epochs).  Workers rebuild
            # state via _init_worker, so spawn only costs pool startup.
            # Encode workers are numpy/cv2-only: pin any jax that gets
            # imported at worker startup to the CPU backend so N workers
            # don't open N accelerator client connections.
            prev = os.environ.get("JAX_PLATFORMS")
            os.environ["JAX_PLATFORMS"] = "cpu"
            try:
                self._pool = ProcessPoolExecutor(
                    max_workers=self.num_workers,
                    mp_context=multiprocessing.get_context("spawn"),
                    initializer=_init_worker,
                    initargs=(self.dataset, self.cfg),
                )
                # eagerly start workers while the env override is active
                # (spawn defers process creation to first submit otherwise)
                list(self._pool.map(int, range(self.num_workers)))
            finally:
                if prev is None:
                    os.environ.pop("JAX_PLATFORMS", None)
                else:
                    os.environ["JAX_PLATFORMS"] = prev
        return self._pool

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield stacked numpy batches for this host's shard of the epoch."""
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(n) if self.is_train else np.arange(n)
        local = order[self.shard_id :: self.num_shards]
        nb = len(local) // self.batch_size
        if not self.drop_last and len(local) % self.batch_size:
            nb += 1
        args = [
            (int(idx), (self.seed, epoch, int(idx)), self.is_train) for idx in local
        ]
        if self.num_workers > 0:
            pool = self._ensure_pool()
            it = pool.map(_encode_index, args, chunksize=4)
        else:
            _init_worker(self.dataset, self.cfg)
            it = map(_encode_index, args)

        buf: List[dict] = []
        produced = 0
        for ex in it:
            buf.append(ex)
            if len(buf) == self.batch_size:
                yield stack_batch(buf)
                buf = []
                produced += 1
                if produced >= nb:
                    break
        if buf and not self.drop_last and produced < nb:
            yield stack_batch(buf)

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None


def prefetch_to_device(
    host_iter: Iterator[Dict[str, np.ndarray]],
    mesh,
    size: int = 2,
) -> Iterator[Any]:
    """Overlap host batch production + H2D transfer with device compute.

    A background thread device_puts (sharded over the mesh) up to ``size``
    batches ahead.
    """
    from centerpose_tpu.parallel.mesh import shard_batch

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()
    err: List[BaseException] = []

    def producer():
        try:
            for batch in host_iter:
                q.put(shard_batch(batch, mesh))
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            break
        yield item
