"""Torch-free reader for PyTorch ``.pth`` checkpoints (zip serialization format).

torchvision publishes ImageNet backbones as ``torch.save``d state_dicts (the
reference consumes them via ``pretrained_backbone=True``,
/root/reference/detection/frcnn_la.py:283, retinanet_cal.py:617-619,685-716).
This framework must ingest the same files without a torch dependency, so this
module parses the format directly:

  * The file is a zip archive: ``<name>/data.pkl`` (a protocol-2 pickle of the
    state_dict) plus one raw little-endian buffer per storage under
    ``<name>/data/<key>``.
  * The pickle references storages through persistent IDs
    ``('storage', StorageClass, key, location, numel)`` and rebuilds tensors
    with ``torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)``.

Both are reimplemented with a restricted ``pickle.Unpickler`` (only the
torch rebuild helpers, storage markers and ``collections.OrderedDict`` may be
loaded — anything else raises, so arbitrary pickled code never runs) and
``numpy.lib.stride_tricks`` for the (rarely non-contiguous) tensor views.

``load_state_dict`` also accepts ``.npz``/``.npy`` files for offline-converted
weights, keeping every entry a plain ``np.ndarray``.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

try:  # bfloat16 storages (jax always ships ml_dtypes)
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

# torch storage class name -> numpy dtype (little-endian buffers on disk).
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageType:
    """Marker produced by ``find_class('torch', 'FloatStorage')`` etc."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    """numpy replica of torch._utils._rebuild_tensor_v2 (view into storage)."""
    arr = storage
    if not size:  # 0-dim tensor
        return np.asarray(arr[storage_offset]).copy()
    itemsize = arr.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size),
        strides=tuple(s * itemsize for s in stride), writeable=False)
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=True, backward_hooks=None):
    return data


_SAFE_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): dict,
}


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file, encoding="latin1")
        self._read_storage = read_storage

    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(_STORAGE_DTYPES[name])
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: not a tensor/state_dict "
            "primitive (only torchvision-style state_dicts are supported)")

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        if not isinstance(storage_type, _StorageType):
            raise pickle.UnpicklingError(
                f"unsupported storage type for key {key!r}")
        return self._read_storage(str(key), storage_type.dtype, int(numel))


def read_pth(path: str) -> dict:
    """Parse a zip-format ``torch.save`` file into {name: np.ndarray}."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError(
                f"{path}: no data.pkl — not a zip-format torch checkpoint "
                "(legacy tar/pickle saves are not supported; re-save with a "
                "modern torch or convert to .npz)")
        prefix = pkl[0][: -len("data.pkl")]

        def read_storage(key: str, dtype: np.dtype, numel: int) -> np.ndarray:
            raw = zf.read(f"{prefix}data/{key}")
            return np.frombuffer(raw, dtype=dtype, count=numel)

        with zf.open(pkl[0]) as f:
            obj = _TorchUnpickler(io.BytesIO(f.read()), read_storage).load()
    return obj


def load_state_dict(path: str) -> dict:
    """Load a flat {param_name: np.ndarray} mapping from ``.pth``/``.npz``/``.npy``.

    For ``.pth`` checkpoints that wrap the weights (e.g. ``{'state_dict': ...}``
    or ``{'model': ...}``), the conventional wrapper keys are unwrapped.
    """
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if path.endswith(".npy"):
        obj = np.load(path, allow_pickle=True).item()
        return {k: np.asarray(v) for k, v in obj.items()}
    obj = read_pth(path)
    for wrapper in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and wrapper in obj and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict mapping, got {type(obj)}")
    return {k: np.asarray(v) for k, v in obj.items()
            if hasattr(v, "shape")}
