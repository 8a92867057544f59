"""Dataset zoo, HDF5/Zarr I/O, caching, and streaming averages.

API mirror of the reference's lagomorph/data.py, torch-free: datasets yield
numpy arrays, batching is a thin host-side iterator feeding
``jax.device_put`` (with batch sharding on a mesh), and item caches use
``numpy.save`` instead of ``torch.save``.
"""
from __future__ import annotations

import os

import numpy as np
import h5py

from .utils import tqdm, Tool

__all__ = [
    "Dataset",
    "MemoryDataset",
    "ZarrDataset",
    "H5Dataset",
    "IndexedDataset",
    "SubsetDataset",
    "MapDataset",
    "CropDataset",
    "NumexprDataset",
    "DownscaledDataset",
    "PreCachedDataset",
    "LazyCachedDataset",
    "CachedDataLoader",
    "ProcessPrefetcher",
    "batch_iterator",
    "dataset_length",
    "batch_average",
    "write_dataset_h5",
    "write_dataset_zarr",
    "write_dataset",
    "load_dataset",
]


class Dataset:
    """Minimal dataset protocol: ``__len__`` and ``__getitem__``."""

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - abstract
        raise NotImplementedError


def dataset_length(dataset):
    return len(dataset)


class MemoryDataset(Dataset):
    """Pre-load an entire dataset into host memory.

    (The reference's MemoryDataset.__getitem__ returns None — data.py:19-20,
    a known defect noted in SURVEY.md §2.2; this one returns the element.)
    """

    def __init__(self, dataset, progress_bar=True):
        rng = range(len(dataset))
        if progress_bar:
            rng = tqdm(rng, "pre-loading data")
        self.elements = [dataset[i] for i in rng]

    def __len__(self):
        return len(self.elements)

    def __getitem__(self, idx):
        return self.elements[idx]


class ZarrDataset(Dataset):
    """Zarr-backed dataset (reference data.py:23-39)."""

    def __init__(self, path, key="images", force_dim=None):
        try:
            import zarr
        except ImportError:
            print("Please install the zarr library to use ZarrDataset.")
            raise
        self.path = path
        self.key = key
        self.ds = zarr.open(path)[key]

    def __len__(self):
        return self.ds.shape[0]

    def __getitem__(self, idx):
        return np.asarray(self.ds[idx, ...])


class H5Dataset(Dataset):
    """Generic dataset for HDF5 files whose first dimension indexes subjects
    (reference data.py:42-90).  ``key`` may be a tuple of dataset names, in
    which case a tuple of arrays is returned; ``force_dim`` prepends
    singleton axes to the first key's items until they are (1+dim)-D."""

    def __init__(self, h5path, key="images", dtype=None, force_dim=None):
        self.h5path = h5path
        if not isinstance(key, (tuple, list)):
            key = (key,)
        self.key = tuple(key)
        if not isinstance(dtype, (tuple, list)):
            dtype = tuple([dtype for _ in self.key])
        self.dtype = tuple(dtype)
        self.force_dim = force_dim

        with h5py.File(self.h5path, "r") as f:
            l = None
            for k in self.key:
                if l is None:
                    l = f[k].shape[0]
                elif f[k].shape[0] != l:
                    raise Exception(f"Mismatched lengths of datasets with keys {key}")
            self._len = l

    def __len__(self):
        return self._len

    def __getitem__(self, idx):
        Is = []
        # open per item for multi-process safety (reference data.py:71-90)
        for i, (k, dt) in enumerate(zip(self.key, self.dtype)):
            with h5py.File(self.h5path, "r") as f:
                I = np.asarray(f[k][idx, ...])
            if i == 0:
                if dt is not None:
                    I = I.astype(dt)
                if self.force_dim is not None:
                    if len(I.shape) > self.force_dim + 1:
                        raise Exception(
                            f"Cannot force dimension to {self.force_dim} from {len(I.shape)}"
                        )
                    while len(I.shape) < self.force_dim + 1:
                        I = I[None]
            Is.append(I)
        if len(Is) == 1:
            return Is[0]
        return tuple(Is)


class IndexedDataset(Dataset):
    """Return (index, element) pairs (reference data.py:93-103)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        return idx, self.dataset[idx]


class SubsetDataset(Dataset):
    """Extract a list of elements of a dataset (reference data.py:106-118)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(np.asarray(indices).reshape(-1))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


class MapDataset(Dataset):
    """Map a function over a dataset (reference data.py:121-132)."""

    def __init__(self, dataset, fun):
        self.dataset = dataset
        self.fun = fun

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        return self.fun(self.dataset[idx])


class CropDataset(Dataset):
    """Crop all items with per-axis (start, stop, step) slices (reference
    data.py:135-159); missing leading axes get full slices."""

    def __init__(self, dataset, slices):
        self.dataset = dataset
        ds0 = self.dataset[0]
        slices = list(slices)
        if len(slices) < len(ds0.shape):
            slices = [(None, None, None)] * (len(ds0.shape) - len(slices)) + slices
        self.slices = tuple(slice(*s) for s in slices)
        del ds0

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        return np.ascontiguousarray(self.dataset[idx][self.slices])


_NUMEXPR_SAFE_FUNCS = {
    name: getattr(np, name)
    for name in (
        "sqrt exp expm1 log log1p log10 sin cos tan arcsin arccos arctan "
        "arctan2 sinh cosh tanh abs absolute minimum maximum where"
    ).split()
}


def _safe_numexpr_eval(expression: str, x: np.ndarray):
    """Evaluate a numexpr-style arithmetic expression of ``x`` without
    numexpr, via an AST whitelist — arithmetic/comparison operators, numeric
    constants, the name ``x``, and a fixed set of numpy ufuncs.  Anything
    else (attribute access, subscripts, arbitrary calls, comprehensions,
    lambdas, ...) raises ValueError: expressions arrive from the CLI, so
    this is deliberately NOT a bare ``eval``."""
    import ast

    tree = ast.parse(expression, mode="eval")
    allowed = (
        ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.Name,
        ast.Call, ast.Compare, ast.Load,
        ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.Pow, ast.FloorDiv,
        ast.USub, ast.UAdd,
        ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.Eq, ast.NotEq,
    )
    for node in ast.walk(tree):
        if not isinstance(node, allowed):
            raise ValueError(
                f"unsupported syntax in numexpr expression: "
                f"{type(node).__name__}"
            )
        if isinstance(node, ast.Constant) and not isinstance(
            node.value, (int, float, complex, bool)
        ):
            raise ValueError("only numeric constants are allowed")
        if isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _NUMEXPR_SAFE_FUNCS
                or node.keywords
            ):
                raise ValueError("only whitelisted numpy calls are allowed")
        if (
            isinstance(node, ast.Name)
            and node.id != "x"
            and node.id not in _NUMEXPR_SAFE_FUNCS
        ):
            raise ValueError(f"unknown name in numexpr expression: {node.id!r}")
    return eval(  # noqa: S307 — AST-whitelisted above, no builtins
        compile(tree, "<numexpr>", "eval"),
        {"__builtins__": {}},
        {**_NUMEXPR_SAFE_FUNCS, "x": x},
    )


class NumexprDataset(Dataset):
    """Apply a numexpr expression in terms of x (reference data.py:162-174).

    Uses numexpr when available; otherwise falls back to a *vetted*
    AST-whitelisted numpy evaluator (:func:`_safe_numexpr_eval`) — never a
    bare ``eval`` of the CLI-supplied string."""

    def __init__(self, dataset, expression):
        self.dataset = dataset
        self.expression = expression

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        x = np.asarray(self.dataset[idx])
        try:
            import numexpr
        except ImportError:
            return _safe_numexpr_eval(self.expression, x)
        return numexpr.evaluate(self.expression)


class DownscaledDataset(Dataset):
    """Average-pool each item by an integer factor over its spatial axes
    (all but the first/channel axis), reference data.py:177-195."""

    def __init__(self, dataset, scale):
        self.dataset = dataset
        self.scale = int(scale)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        J = np.asarray(self.dataset[idx])
        if J.dtype not in (np.float32, np.float64):
            J = J.astype(np.float32)
        s = self.scale
        spatial = J.shape[1:]
        # crop to multiples, then reshape-mean (avg pool, stride == kernel)
        crop = tuple(slice(0, (n // s) * s) for n in spatial)
        J = J[(slice(None),) + crop]
        newshape = [J.shape[0]]
        pool_axes = []
        for n in J.shape[1:]:
            newshape.extend([n // s, s])
            pool_axes.append(len(newshape) - 1)
        return J.reshape(newshape).mean(axis=tuple(pool_axes))


class PreCachedDataset(Dataset):
    """Cache items to a tempdir during initialization (reference
    data.py:198-223)."""

    def __init__(self, dataset, sampler=None, cache_dir=None):
        import tempfile

        self.dataset = dataset
        if sampler is None:
            sampler = range(len(dataset))
        self.sampler = sampler
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
        self._tmpdir = tempfile.TemporaryDirectory(
            dir=cache_dir, prefix="lagomorph_tpu.PreCachedDataset."
        )
        self.tmpdir = self._tmpdir.name
        for j in sampler:
            np.save(self.filename(j), np.asarray(dataset[j]))

    def filename(self, j):
        return os.path.join(self.tmpdir, f"{j}.npy")

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, j):
        fn = self.filename(j)
        if not os.path.isfile(fn):
            raise ValueError(f"Index {j} was not cached by PreCachedDataset")
        return np.load(fn)


class LazyCachedDataset(Dataset):
    """Cache items to a tempdir as they are requested (reference
    data.py:226-252)."""

    def __init__(self, dataset, cache_dir=None):
        import tempfile

        self.dataset = dataset
        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
        self._tmpdir = tempfile.TemporaryDirectory(
            dir=cache_dir, prefix="lagomorph_tpu.LazyCachedDataset."
        )
        self.tmpdir = self._tmpdir.name

    def filename(self, j):
        return os.path.join(self.tmpdir, f"{j}.npy")

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, j):
        fn = self.filename(j)
        if os.path.isfile(fn):
            return np.load(fn)
        di = np.asarray(self.dataset[j])
        np.save(fn, di)
        return di


def batch_iterator(dataset, batch_size, dtype=None, indices=None):
    """Yield stacked numpy minibatches from a dataset (the host-side
    replacement for torch DataLoader in the atlas builders).

    If items are (index, array) pairs (IndexedDataset), yields
    ``(indices, batch)`` pairs.
    """
    n = len(dataset)
    order = range(n) if indices is None else indices
    order = list(order)
    for start in range(0, len(order), batch_size):
        chunk = order[start : start + batch_size]
        items = [dataset[i] for i in chunk]
        if items and isinstance(items[0], tuple) and len(items[0]) == 2 and np.isscalar(items[0][0]):
            ix = np.asarray([it[0] for it in items])
            arr = np.stack([np.asarray(it[1]) for it in items])
            if dtype is not None:
                arr = arr.astype(dtype)
            yield ix, arr
        else:
            arr = np.stack([np.asarray(it) for it in items])
            if dtype is not None:
                arr = arr.astype(dtype)
            yield arr


class CachedDataLoader:
    """Pass through a batch iterator once, caching minibatches to disk, then
    replay from disk (reference data.py:255-305)."""

    def __init__(self, batches, cache_dir=None, progress_bar=True):
        import tempfile

        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
        self._tmpdir = tempfile.TemporaryDirectory(
            dir=cache_dir, prefix="lagomorph_tpu.CachedDataLoader."
        )
        self.tmpdir = self._tmpdir.name
        self.filenames = []
        bar = batches
        if progress_bar:
            bar = tqdm(bar, desc="Caching minibatches")
        for j, b in enumerate(bar):
            fn = os.path.join(self.tmpdir, f"{j}.npy")
            np.save(fn, np.asarray(b))
            self.filenames.append(fn)

    def __len__(self):
        return len(self.filenames)

    def __iter__(self):
        for f in self.filenames:
            yield np.load(f)

    def __getitem__(self, i):
        # direct indexed access — one file read per batch (the per-batch
        # .npy layout makes the cache random-access, unlike the reference's
        # replay-only loader)
        return np.load(self.filenames[i])


class ProcessPrefetcher:
    """Process-parallel batch prefetcher: forked worker processes pull batch
    indices off a task queue, materialize ``loader[i]`` (the disk read +
    decode — the GIL-bound half of staging), and publish the bytes through a
    ring of shared-memory slots.  The TPU-native analogue of the reference's
    multi-worker DataLoader with pinned staging (reference lddmm.py:171-177):
    workers own the I/O, the parent keeps the accelerator handle and does
    only the host->device put.

    ``loader`` must be random-access (``len()`` / ``[i] -> np.ndarray``) and
    fork-inheritable (``CachedDataLoader``, ``NativeBatchCache``, a list of
    arrays, any Dataset-backed loader without live device handles).  Workers
    are forked lazily on the first ``submit`` and run ONLY numpy — no jax is
    touched in the children, so the remote-TPU client state of the parent is
    never shared or re-initialized.

    Protocol: ``submit(i)`` queues batch ``i`` into a free slot (blocking on
    slot reuse once ``depth`` submissions are in flight); ``get(i)`` blocks
    until the bytes land and returns a parent-owned copy (the slot is
    recycled immediately).  ``get`` on an unsubmitted index falls back to a
    direct in-process read, so callers may prefetch opportunistically.
    Results larger than the slot (first-batch probe) or worker exceptions
    travel through the result queue instead (pickled / re-raised).

    Fork hazard + watchdog: forking a parent that already runs jax/relay
    client threads can (rarely, timing-dependent) leave a child holding a
    lock some other parent thread held at fork time — the child then
    deadlocks on its first allocation and the batch never lands.  ``get``
    therefore waits at most ``LM_PREFETCH_TIMEOUT`` seconds (default 120)
    for in-flight batches; on expiry (or if every worker died) the
    prefetcher DEGRADES: wedged workers are killed by exact PID, shared
    memory is released, and this and all future batches are read directly
    in-process.  Training continues without prefetch overlap instead of
    hanging."""

    def __init__(self, loader, workers=2, depth=None):
        import multiprocessing as mp

        if not hasattr(mp, "get_context"):
            raise RuntimeError("multiprocessing contexts unavailable")
        try:
            self._ctx = mp.get_context("fork")
        except ValueError as e:  # pragma: no cover - non-POSIX
            raise RuntimeError(
                "ProcessPrefetcher requires the fork start method"
            ) from e
        import threading

        self.loader = loader
        self.workers = max(1, int(workers))
        self.depth = int(depth) if depth else self.workers + 1
        # submit() and get() may run on different parent threads (main loop
        # vs staging pool): one lock serializes ring/queue bookkeeping
        self._lock = threading.Lock()
        self._started = False
        self._failed = False
        self._timeout = float(os.environ.get("LM_PREFETCH_TIMEOUT", "120"))
        self._pending = {}  # batch index -> slot
        self._ready = {}  # batch index -> result-queue payload
        self._free = []
        self._procs = []
        self._shm = []

    @staticmethod
    def _worker(loader, task_q, done_q, shm_names, slot_bytes):
        from multiprocessing import shared_memory

        segs = [shared_memory.SharedMemory(name=n) for n in shm_names]
        try:
            while True:
                msg = task_q.get()
                if msg is None:
                    return
                i, slot = msg
                try:
                    arr = np.ascontiguousarray(np.asarray(loader[i]))
                    if arr.nbytes <= slot_bytes:
                        view = np.ndarray(
                            arr.shape, arr.dtype, buffer=segs[slot].buf
                        )
                        view[...] = arr
                        done_q.put((i, slot, arr.shape, arr.dtype.str, None))
                    else:  # oversize: ship through the queue
                        done_q.put((i, slot, None, None, arr))
                except Exception as e:  # surface in the parent's get()
                    done_q.put((i, slot, None, None, e))
        finally:
            for s in segs:
                s.close()

    def _start(self):
        from multiprocessing import shared_memory

        probe = np.ascontiguousarray(np.asarray(self.loader[0]))
        self._slot_bytes = max(probe.nbytes, 1)
        self._task_q = self._ctx.Queue()
        self._done_q = self._ctx.Queue()
        for k in range(self.depth):
            seg = shared_memory.SharedMemory(
                create=True, size=self._slot_bytes
            )
            self._shm.append(seg)
            self._free.append(k)
        names = [s.name for s in self._shm]
        for _ in range(self.workers):
            p = self._ctx.Process(
                target=self._worker,
                args=(self.loader, self._task_q, self._done_q, names,
                      self._slot_bytes),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        self._started = True

    def _drain_one(self, block=True):
        """Move one worker result into ``_ready``.  Blocking waits poll in
        1 s chunks up to ``_timeout`` with a worker-liveness check each
        chunk; a timeout (wedged fork) or a fully-dead worker pool degrades
        the prefetcher instead of hanging (returns False)."""
        import queue as _q
        import time as _time

        deadline = _time.monotonic() + self._timeout
        while True:
            try:
                i, slot, shape, dt, extra = self._done_q.get(
                    block=block, timeout=min(1.0, self._timeout) if block
                    else None
                )
                break
            except _q.Empty:
                if not block:
                    return False
                alive = any(p.is_alive() for p in self._procs)
                if not alive or _time.monotonic() >= deadline:
                    self._degrade(
                        "workers died" if not alive
                        else f"no result within {self._timeout:.0f}s "
                        "(wedged fork?)"
                    )
                    return False
        self._ready[i] = (slot, shape, dt, extra)
        self._pending.pop(i, None)
        return True

    def _degrade(self, why):
        """Kill the worker pool and fall back to direct in-process reads
        for this and every future batch (called with ``_lock`` held)."""
        import warnings

        warnings.warn(
            f"ProcessPrefetcher degraded to direct reads: {why}",
            RuntimeWarning, stacklevel=3,
        )
        self._failed = True
        for p in self._procs:
            if p.is_alive():
                p.kill()  # exact child PID — never pattern-based
            p.join(timeout=5)
        for s in self._shm:
            try:
                s.close()
                s.unlink()
            except FileNotFoundError:  # pragma: no cover
                pass
        self._procs, self._shm, self._free = [], [], []
        self._pending.clear()
        self._ready.clear()
        self._started = False

    def submit(self, i):
        """Queue batch ``i`` for background materialization (idempotent for
        in-flight/ready indices).  Blocks only when all slots are in use."""
        i = int(i)
        with self._lock:
            if self._failed or i in self._pending or i in self._ready:
                return
            if not self._started:
                self._start()
            while not self._free:
                if not self._pending:
                    # every slot is parked under a ready-but-unfetched
                    # batch; draining would block forever w/ nothing in
                    # flight
                    raise RuntimeError(
                        "ProcessPrefetcher ring full of unfetched batches: "
                        "call get() before submitting more (or raise depth)"
                    )
                if not self._drain_one(block=True):
                    return  # degraded while waiting for a slot
            slot = self._free.pop()
            self._pending[i] = slot
            self._task_q.put((i, slot))

    def get(self, i):
        """Return batch ``i`` as a parent-owned array, blocking on the
        workers if needed.  Unsubmitted indices read directly in-process."""
        i = int(i)
        with self._lock:
            if i not in self._pending and i not in self._ready:
                direct = True
            else:
                direct = False
                while i not in self._ready:
                    if not self._drain_one(block=True):
                        direct = True  # degraded: batch will never land
                        break
                if not direct:
                    slot, shape, dt, extra = self._ready.pop(i)
                    if extra is None:
                        view = np.ndarray(
                            shape, np.dtype(dt), buffer=self._shm[slot].buf
                        )
                        out = np.array(view)  # copy out, recycle the slot
                    self._free.append(slot)
        if direct:
            return np.asarray(self.loader[i])
        if extra is not None:
            if isinstance(extra, Exception):
                raise extra
            return np.asarray(extra)  # oversize payload
        return out

    def close(self):
        if not self._started:
            return
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():  # pragma: no cover - stuck worker
                p.terminate()
                p.join(timeout=5)
        for s in self._shm:
            try:
                s.close()
                s.unlink()
            except FileNotFoundError:  # pragma: no cover
                pass
        self._procs, self._shm, self._free = [], [], []
        self._pending.clear()
        self._ready.clear()
        self._started = False

    def __del__(self):  # pragma: no cover - best-effort cleanup
        try:
            self.close()
        except Exception:
            pass


def batch_average(batches, dim=0, progress_bar=True):
    """Streaming average over minibatches along ``dim`` in float64 (reference
    data.py:308-336).  ``batches`` is an iterable of numpy arrays or
    (indices, array) pairs."""
    avg = None
    dtype = None
    sumsizes = 0
    it = batches
    if progress_bar:
        it = tqdm(it, "image avg")
    for img in it:
        if isinstance(img, tuple):
            _, img = img
        img = np.asarray(img)
        sz = img.shape[dim]
        if dtype is None:
            dtype = img.dtype
        avi = img.astype(np.float64).sum(axis=dim)
        if avg is None:
            avg = avi / sz
        else:
            avg = avg * (sumsizes / (sumsizes + sz)) + avi / (sumsizes + sz)
        sumsizes += sz
    if dtype in (np.float32, np.float64):
        avg = avg.astype(dtype)
    return avg


def _item_parts(item):
    """View one dataset item as a tuple of numpy arrays (single-array items
    become 1-tuples)."""
    parts = item if isinstance(item, (list, tuple)) else (item,)
    return tuple(np.asarray(p) for p in parts)


def _sizing_plan(dataset, key):
    """Shared sizing logic for the dataset writers: normalize ``key`` to a
    tuple, probe element 0 for per-key shape/dtype prototypes, and validate
    the key count against the item arity."""
    keys = tuple(key) if isinstance(key, (list, tuple)) else (key,)
    protos = _item_parts(dataset[0])
    if len(protos) != len(keys):
        raise Exception(
            f"Dataset returns tuple with {len(protos)} entries, "
            f"but only {len(keys)} keys given"
        )
    return keys, protos


def _fill_arrays(dataset, arrays, desc):
    """Stream every item of ``dataset`` into pre-allocated per-key arrays
    (h5py or zarr — anything supporting ``arr[i, ...] = value``)."""
    for i in tqdm(range(len(dataset)), desc):
        for sink, part in zip(arrays, _item_parts(dataset[i])):
            sink[i, ...] = part


def write_dataset_h5(dataset, h5path, key="images"):
    """Write a dataset in the standard per-subject-chunked, lzf-compressed
    HDF5 layout (same on-disk schema as reference data.py:339-387)."""
    keys, protos = _sizing_plan(dataset, key)
    with h5py.File(h5path, "w") as f:
        arrays = [
            f.create_dataset(
                k,
                shape=(len(dataset), *p.shape),
                dtype=p.dtype,
                chunks=(1, *p.shape),
                compression="lzf",
            )
            for k, p in zip(keys, protos)
        ]
        _fill_arrays(dataset, arrays, desc=f"writing {os.path.basename(h5path)}")


def write_dataset_zarr(dataset, path, key="images"):
    """Write a dataset as a Zarr directory store (same layout as reference
    data.py:389-436)."""
    try:
        import zarr
    except ImportError:
        print("Please install the zarr library to use write_dataset_zarr.")
        raise

    root = zarr.group(store=zarr.DirectoryStore(path), overwrite=True)
    keys, protos = _sizing_plan(dataset, key)
    arrays = [
        root.zeros("/" + k, shape=(len(dataset), *p.shape),
                   chunks=(1, *p.shape), dtype=p.dtype)
        for k, p in zip(keys, protos)
    ]
    _fill_arrays(dataset, arrays, desc=f"writing {os.path.basename(path)}")


def write_dataset(dataset, path, **kwargs):
    _, ext = os.path.splitext(path)
    if ext.lower() in [".h5", ".hdf5", ".hdf"]:
        return write_dataset_h5(dataset, path, **kwargs)
    elif ext.lower() in [".zarr"]:
        return write_dataset_zarr(dataset, path, **kwargs)
    raise RuntimeError(f'Could not determine file type from extension "{ext}"')


def load_dataset(path, **kwargs):
    _, ext = os.path.splitext(path)
    if ext.lower() in [".h5", ".hdf5", ".hdf"]:
        return H5Dataset(path, **kwargs)
    elif ext.lower() in [".zarr"]:
        return ZarrDataset(path, **kwargs)
    raise RuntimeError(f'Could not determine file type from extension "{ext}"')


def parse_slice_spec(spec: str):
    """Turn a comma/colon slice string like ``"5:-5,0:127,::2"`` into a list
    of (start, stop, step) triples (empty fields -> None; a lone number is a
    stop bound, matching the reference CLI's crop contract)."""
    triples = []
    for field in spec.split(","):
        bounds = [int(b) if b else None for b in field.split(":")]
        if len(bounds) == 1:
            bounds = [None, bounds[0]]
        bounds += [None] * (3 - len(bounds))
        triples.append(tuple(bounds[:3]))
    return triples


# Declarative CLI flag specs: (flag, argparse kwargs).  Flag names, defaults,
# and semantics are the reference CLI's contract (data.py verbs); the wording
# and plumbing are ours.
_FLAG = {
    "h5key": ("--h5key", dict(default="images",
                              help="HDF5 dataset name to read (and write)")),
    "key": ("--key", dict(default="images",
                          help="dataset name to read (and write)")),
    "h5keys": ("--h5keys", dict(
        default="images,labels",
        help="comma-separated dataset names carried through the split")),
    "copy_other_keys": ("--copy_other_keys", dict(
        action="store_true",
        help="also copy every other key of the input file, unchanged")),
    "random_seed": ("--random_seed", dict(
        default=0, type=int, help="seed for the pseudo-random split")),
    "stratify_key": ("--stratify_key", dict(
        default=None, help="Key to use for stratification labels")),
}


class _Tool(Tool):
    """Generic dataset utilities not specific to one class of registration methods"""

    module_name = "lagomorph_tpu data"
    subcommands = ["average", "crop", "downscale", "numexpr", "split", "splitcv"]

    # ---- shared plumbing -------------------------------------------------

    def _verb_args(self, verb, positionals, flags):
        """Build a verb parser from declarative specs and parse argv[2:]."""
        import sys

        parser = self.new_parser(verb)
        for name, kw in positionals:
            parser.add_argument(name, **kw)
        for f in flags:
            if isinstance(f, str):
                f = _FLAG[f]
            names, kw = f
            if isinstance(names, str):
                names = (names,)
            parser.add_argument(*names, **kw)
        return parser.parse_args(sys.argv[2:])

    @staticmethod
    def copy_other_keys(infile, outfile, key):
        keep = (key,) if isinstance(key, str) else tuple(key)
        with h5py.File(infile, "r") as fi, h5py.File(outfile, "a") as fo:
            for k in tqdm(fi.keys(), desc="other keys"):
                if k not in keep:
                    fi.copy(k, fo)

    def _emit(self, transformed, out_path, key, args, zarr_ok=False):
        """Write a (possibly wrapped) dataset, stamp provenance on the
        primary key, and optionally mirror the remaining input keys."""
        if zarr_ok:
            write_dataset(transformed, out_path, key=key)
        else:
            write_dataset_h5(transformed, out_path, key=key)
        first = key if isinstance(key, str) else key[0]
        with h5py.File(out_path, "a") as f:
            self._stamp_dataset(f[first], args)
        if getattr(args, "copy_other_keys", False):
            self.copy_other_keys(args.input, out_path, key)

    @staticmethod
    def _grouping_labels(path, label_key):
        """Load (and flatten trailing singleton of) stratification labels."""
        if label_key is None:
            return None
        with h5py.File(path, "r") as f:
            labels = np.array(f[label_key])
        if labels.ndim == 2 and labels.shape[1] == 1:
            labels = labels[:, 0]
        elif labels.ndim > 2:
            raise Exception(
                f"Dimension of dataset {label_key} cannot be more than two"
            )
        return labels

    # ---- element-wise filter verbs (load -> wrap -> write) --------------

    _IN_OUT = (
        ("input", dict(type=str, help="Path to input image HDF5 file")),
        ("output", dict(type=str, help="Path to output HDF5 file")),
    )

    def average(self):
        """Average a dataset inside an HDF5 file in the first dimension"""
        args = self._verb_args(
            "average",
            self._IN_OUT,
            [
                ("--h5key", dict(default="images",
                                 help="HDF5 dataset name to average over")),
                ("--output_h5key", dict(
                    default="average_image",
                    help="dataset name for the mean image in the output")),
                ("--batch_size", dict(default=50, type=int,
                                      help="subjects per streaming batch")),
            ],
        )
        batches = batch_iterator(H5Dataset(args.input, key=args.h5key),
                                 args.batch_size)
        mean_img = batch_average(batches)
        with h5py.File(args.output, "w") as f:
            self._stamp_dataset(
                f.create_dataset(args.output_h5key, data=mean_img[None]), args
            )

    def downscale(self):
        """Downscale an image dataset using average pooling"""
        args = self._verb_args(
            "downscale",
            self._IN_OUT,
            ["key",
             ("--scale", dict(default=2, type=int,
                              help="width of the average-pooling window")),
             "copy_other_keys"],
        )
        src = load_dataset(args.input, key=args.key)
        self._emit(DownscaledDataset(src, scale=args.scale),
                   args.output, args.key, args, zarr_ok=True)

    def crop(self):
        """Crop all the images in an image dataset"""
        args = self._verb_args(
            "crop",
            self._IN_OUT,
            ["h5key",
             ("--slices", dict(
                 required=True,
                 help='per-axis pixel ranges, comma- and colon-separated '
                      '(e.g. "5:-5,0:127,0:256")')),
             "copy_other_keys"],
        )
        src = H5Dataset(args.input, key=args.h5key)
        cropped = CropDataset(src, slices=parse_slice_spec(args.slices))
        self._emit(cropped, args.output, args.h5key, args)

    def numexpr(self):
        """Apply a numeric expression to an image dataset using numexpr"""
        args = self._verb_args(
            "numexpr",
            self._IN_OUT,
            ["h5key",
             (("--expression", "-e"), dict(
                 required=True,
                 help='expression in the variable x (e.g. "x/255")')),
             "copy_other_keys"],
        )
        src = H5Dataset(args.input, key=args.h5key)
        self._emit(NumexprDataset(src, expression=args.expression),
                   args.output, args.h5key, args)

    # ---- subset-extraction verbs -----------------------------------------

    def _emit_subset(self, dataset, indices, out_path, keys, args):
        """Write the selected subjects of a multi-key dataset + provenance."""
        self._emit(SubsetDataset(dataset, indices), out_path, keys, args)

    def split(self):
        """Split a dataset into training and testing (or validation)"""
        args = self._verb_args(
            "split",
            (
                ("input", dict(type=str, help="Path to input image HDF5 file")),
                ("train_output", dict(
                    type=str, help="Path to output HDF5 file (training)")),
                ("test_output", dict(
                    type=str, help="Path to output HDF5 file (testing)")),
            ),
            ["h5keys", "copy_other_keys", "random_seed",
             ("--test_size", dict(
                 default=0.25,
                 help="fraction of subjects if <= 1, else a subject count")),
             "stratify_key"],
        )
        keys = args.h5keys.split(",")
        dataset = H5Dataset(args.input, key=keys)
        labels = self._grouping_labels(args.input, args.stratify_key)

        # a value > 1 means an absolute subject count, not a fraction
        test_size = float(args.test_size)
        if test_size > 1:
            test_size = int(test_size)

        from sklearn.model_selection import train_test_split

        train_ix, test_ix = train_test_split(
            range(len(dataset)),
            test_size=test_size,
            random_state=args.random_seed,
            stratify=labels,
        )
        self._emit_subset(dataset, train_ix, args.train_output, keys, args)
        self._emit_subset(dataset, test_ix, args.test_output, keys, args)

    def splitcv(self):
        """Split a dataset into training and testing sets for cross-validation"""
        args = self._verb_args(
            "splitcv",
            (
                ("input", dict(type=str, help="Path to input image HDF5 file")),
                ("output_format", dict(
                    type=str,
                    help="Path to output HDF5 file "
                         "(use placeholders {fold} and {split})")),
            ),
            ["h5keys", "copy_other_keys", "random_seed",
             ("--num_folds", dict(default=2, type=int,
                                  help="number of cross-validation folds")),
             "stratify_key"],
        )
        keys = args.h5keys.split(",")
        dataset = H5Dataset(args.input, key=keys)
        labels = self._grouping_labels(args.input, args.stratify_key)

        from sklearn.model_selection import KFold, StratifiedKFold

        cv_cls = KFold if labels is None else StratifiedKFold
        cv = cv_cls(n_splits=args.num_folds, shuffle=True,
                    random_state=args.random_seed)
        folds = cv.split(np.arange(len(dataset)),
                         *(() if labels is None else (labels,)))

        for fold, (train_ix, test_ix) in enumerate(folds):
            for name, indices in (("train", train_ix), ("test", test_ix)):
                out = args.output_format.format(fold=fold, split=name)
                self._emit_subset(dataset, indices, out, keys, args)
