"""S7 — torch-format checkpoint I/O without torch.

The reference persists per-regime GAN generators with ``torch.save``
(regime_gan.py:233-280: ``{"state_dict": OrderedDict[str, Tensor],
"data_mean": float, "data_std": float}`` per ``gen_regime_{k}.pt``).
This environment has no torch, but torch's serialization format is
public and simple: a ZIP archive holding

    <name>/data.pkl      pickle of the object graph; tensors appear as
                         ``torch._utils._rebuild_tensor_v2(storage,
                         offset, size, stride, requires_grad, hooks)``
                         calls whose storages are pickle *persistent
                         ids* ``('storage', <StorageType>, key, device,
                         numel)``
    <name>/data/<key>    raw little-endian storage bytes, one per id
    <name>/version       serialization version line
    <name>/byteorder     'little' (torch >= 2.1)

so the stdlib ``zipfile`` + a restricted ``pickle.Unpickler`` can read a
REAL reference artifact into numpy arrays, and a matching writer emits
checkpoints real torch loads back (``torch.load(..., weights_only=True)``
accepts exactly this object diet: containers + tensors + primitives).

Security: the reader maps only the torch symbols tensors need and
refuses every other global — the same restriction torch's own
``weights_only=True`` loader applies — so a malicious pickle cannot
execute code through it.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

# torch storage class name ↔ numpy dtype (little-endian on disk)
_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}
_DTYPE_STORAGE = {
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.bool_): "BoolStorage",
}


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. during unpickling."""

    def __init__(self, name: str):
        self.name = name


def _rebuild_tensor_np(storage, offset, size, stride, *_rest):
    """numpy twin of ``torch._utils._rebuild_tensor_v2`` — materialize
    the (possibly strided) view over the flat storage, then copy so the
    result owns its memory."""
    arr, itemsize = storage
    if not size:
        return arr[offset : offset + 1].copy().reshape(())
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=tuple(size), strides=strides, writeable=False
    )
    return view.copy()


class _CheckpointUnpickler(pickle.Unpickler):
    """Allowlist unpickler: torch tensor-rebuild machinery only."""

    def __init__(self, f, zf: zipfile.ZipFile, prefix: str):
        super().__init__(f)
        self._zf = zf
        self._prefix = prefix

    _SAFE = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_np,
    }

    def find_class(self, module, name):
        if (module, name) in self._SAFE:
            return self._SAFE[(module, name)]
        if module.startswith("torch") and name in _STORAGE_DTYPES:
            return _StorageType(name)
        raise pickle.UnpicklingError(
            f"checkpoint reader refuses global {module}.{name} "
            "(tensor state_dicts never need it)"
        )

    def persistent_load(self, pid):
        kind, stype, key, _location, numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind!r}")
        name = stype.name if isinstance(stype, _StorageType) else str(stype)
        dtype = np.dtype(_STORAGE_DTYPES[name]).newbyteorder("<")
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        arr = np.frombuffer(raw, dtype=dtype, count=numel).astype(
            _STORAGE_DTYPES[name]
        )
        return (arr, dtype.itemsize)


def load_torch_checkpoint(path: str):
    """Read a ``torch.save``-format zip checkpoint into plain python:
    tensors become numpy arrays, containers and scalars pass through."""
    with zipfile.ZipFile(path) as zf:
        pkls = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkls:
            raise ValueError(
                f"{path}: no <name>/data.pkl member — not a zip-format "
                "torch checkpoint (legacy tar/pickle formats unsupported)"
            )
        prefix = pkls[0][: -len("/data.pkl")]
        with zf.open(pkls[0]) as f:
            return _CheckpointUnpickler(f, zf, prefix).load()


# ---------------------------------------------------------------- save --


class _TensorRef:
    """Marks an array for tensor-style serialization in the writer."""

    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key


class _GlobalRef:
    """Pickles as ``GLOBAL module\\nname`` without importing the module —
    how the writer names torch symbols in a torch-less environment."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name


class _Persistent:
    """Pickles its payload as a persistent id (BINPERSID)."""

    def __init__(self, pid):
        self.pid = pid


class _CheckpointPickler(pickle._Pickler):
    """Pure-python pickler with opcode-level dispatch for the three
    wrapper types — emits exactly the global refs + persistent ids
    ``torch.load`` expects, in an environment where torch itself cannot
    be imported (so ``save_global``'s import check would fail)."""

    def __init__(self, f):
        super().__init__(f, protocol=2)
        self.storages: dict[str, bytes] = {}

    dispatch = dict(pickle._Pickler.dispatch)

    def _save_global_ref(self, obj):
        self.write(pickle.GLOBAL + f"{obj.module}\n{obj.name}\n".encode())

    dispatch[_GlobalRef] = _save_global_ref

    def _save_persistent(self, obj):
        self.save(obj.pid)
        self.write(pickle.BINPERSID)

    dispatch[_Persistent] = _save_persistent

    def _save_tensor(self, obj):
        size = tuple(int(d) for d in obj.arr.shape)
        arr = np.ascontiguousarray(obj.arr)  # NB: promotes 0-d to (1,)
        sname = _DTYPE_STORAGE[arr.dtype]
        self.storages[obj.key] = arr.astype(
            arr.dtype.newbyteorder("<"), copy=False
        ).tobytes()
        storage_pid = (
            "storage",
            _GlobalRef("torch", sname),
            obj.key,
            "cpu",
            int(arr.size),
        )
        # C-contiguous element strides of the ORIGINAL shape (torch
        # stores strides in elements; () for 0-d scalars)
        stride_l, acc = [], 1
        for d in reversed(size):
            stride_l.append(acc)
            acc *= d
        stride = tuple(reversed(stride_l))
        self._save_global_ref(_GlobalRef("torch._utils", "_rebuild_tensor_v2"))
        self.save(
            (
                _Persistent(storage_pid),
                0,
                size,
                stride,
                False,
                OrderedDict(),
            )
        )
        self.write(pickle.REDUCE)
        self.memoize(obj)

    dispatch[_TensorRef] = _save_tensor


def _tag_tensors(obj, counter):
    """Replace every ndarray in the object graph with a _TensorRef."""
    if isinstance(obj, np.ndarray):
        key = str(counter[0])
        counter[0] += 1
        return _TensorRef(obj, key)
    if isinstance(obj, OrderedDict):
        return OrderedDict((k, _tag_tensors(v, counter)) for k, v in obj.items())
    if isinstance(obj, dict):
        return {k: _tag_tensors(v, counter) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = [_tag_tensors(v, counter) for v in obj]
        return type(obj)(t) if not isinstance(obj, tuple) else tuple(t)
    return obj


def save_torch_checkpoint(obj, path: str, archive_name: str = "archive") -> None:
    """Write ``obj`` (containers / numpy arrays / scalars) as a
    zip-format torch checkpoint that real ``torch.load`` reads back."""
    tagged = _tag_tensors(obj, [0])
    buf = io.BytesIO()
    p = _CheckpointPickler(buf)
    p.dump(tagged)

    def _entry(name: str) -> zipfile.ZipInfo:
        # fixed timestamp: the checkpoint bytes are a pure function of
        # the object graph (golden-file pinned in tests/test_torch_io.py)
        return zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(_entry(f"{archive_name}/data.pkl"), buf.getvalue())
        for key, raw in p.storages.items():
            zf.writestr(_entry(f"{archive_name}/data/{key}"), raw)
        zf.writestr(_entry(f"{archive_name}/version"), "3\n")
        zf.writestr(_entry(f"{archive_name}/byteorder"), "little")
