"""S7 torch-format checkpoint I/O (ml/torch_io.py) — no torch in the
environment, so the tests verify both directions structurally: the
reader consumes a pickle built with torch.serialization's exact
persistent-id scheme, and the writer emits torch's exact opcodes
(GLOBAL torch._utils _rebuild_tensor_v2 / BINPERSID storages), which is
what ``torch.load(..., weights_only=True)`` requires.

reference: regime_gan.py:233-280 (torch.save/load of per-regime
{"state_dict", "data_mean", "data_std"} checkpoints + meta.json).
"""

from __future__ import annotations

import io
import pickle
import pickletools
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from synthetic_datagen_spark.ml.torch_io import (
    load_torch_checkpoint,
    save_torch_checkpoint,
)


def _roundtrip(obj, tmp_path, name="ck.pt"):
    p = str(tmp_path / name)
    save_torch_checkpoint(obj, p)
    return load_torch_checkpoint(p)


def test_roundtrip_all_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    sd = OrderedDict(
        [
            ("f32", rng.normal(size=(5, 3)).astype(np.float32)),
            ("f64", rng.normal(size=(2, 2, 2))),
            ("i64", np.arange(7, dtype=np.int64)),
            ("i32", np.arange(4, dtype=np.int32)),
            ("u8", np.arange(256, dtype=np.uint8)),
            ("b", np.array([True, False, True])),
        ]
    )
    obj = {"state_dict": sd, "data_mean": 1.5, "data_std": 2.0, "tag": "g"}
    back = _roundtrip(obj, tmp_path)
    assert back["data_mean"] == 1.5 and back["tag"] == "g"
    assert isinstance(back["state_dict"], OrderedDict)
    assert list(back["state_dict"]) == list(sd)
    for k in sd:
        assert back["state_dict"][k].dtype == sd[k].dtype, k
        assert np.array_equal(back["state_dict"][k], sd[k]), k


def test_roundtrip_scalar_and_empty(tmp_path):
    obj = {"s": np.float32(3.25).reshape(()), "e": np.zeros((0, 4))}
    # 0-d arrays and empty tensors survive
    back = _roundtrip({"s": np.array(3.25), "e": np.zeros((0, 4))}, tmp_path)
    assert back["s"].shape == () and float(back["s"]) == 3.25
    assert back["e"].shape == (0, 4)


def test_writer_emits_torch_opcodes(tmp_path):
    """The pickle must reference torch's rebuild machinery by name —
    that is what makes the artifact readable by real torch.load."""
    p = str(tmp_path / "ops.pt")
    save_torch_checkpoint(
        {"state_dict": OrderedDict([("w", np.ones((2, 2), dtype=np.float32))])}, p
    )
    with zipfile.ZipFile(p) as zf:
        names = zf.namelist()
        raw = zf.read("archive/data.pkl")
    assert "archive/version" in names and "archive/data/0" in names
    ops = [(op.name, arg) for op, arg, _ in pickletools.genops(raw)]
    globals_used = [a for n, a in ops if n == "GLOBAL"]
    assert "torch._utils _rebuild_tensor_v2" in globals_used
    assert "torch FloatStorage" in globals_used
    assert any(n == "BINPERSID" for n, _ in ops)


def test_reader_consumes_torch_written_layout(tmp_path):
    """Build a checkpoint exactly the way torch.serialization does
    (typed-storage persistent ids, GLOBAL refs) and read it back."""
    torch_mod = types.ModuleType("torch")
    utils_mod = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*a):  # never called at save time
        raise AssertionError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils_mod._rebuild_tensor_v2 = _rebuild_tensor_v2

    class DoubleStorage:
        pass

    DoubleStorage.__module__ = "torch"
    DoubleStorage.__qualname__ = "DoubleStorage"
    torch_mod.DoubleStorage = DoubleStorage
    torch_mod._utils = utils_mod

    arr = np.random.default_rng(1).normal(size=(3, 4))

    class Tensor:
        def __reduce_ex__(self, proto):
            return (
                _rebuild_tensor_v2,
                (
                    Storage(),
                    0,
                    arr.shape,
                    tuple(s // arr.itemsize for s in arr.strides),
                    False,
                    OrderedDict(),
                ),
            )

    class Storage:
        pass

    storages = {}

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, Storage):
                storages["0"] = arr.tobytes()
                return ("storage", DoubleStorage, "0", "cpu", int(arr.size))
            return None

    sys.modules["torch"] = torch_mod
    sys.modules["torch._utils"] = utils_mod
    try:
        buf = io.BytesIO()
        P(buf, protocol=2).dump(
            {"state_dict": OrderedDict([("w", Tensor())]), "data_mean": -1.0}
        )
    finally:
        del sys.modules["torch"], sys.modules["torch._utils"]

    p = str(tmp_path / "torch_style.pt")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", storages["0"])
        zf.writestr("archive/version", "3\n")
    back = load_torch_checkpoint(p)
    assert back["data_mean"] == -1.0
    assert np.array_equal(back["state_dict"]["w"], arr)


def test_reader_refuses_arbitrary_globals(tmp_path):
    """weights_only discipline: a pickle referencing os.system must be
    rejected, not executed."""
    payload = b"cos\nsystem\n(S'echo pwned'\ntR."
    p = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", payload)
        zf.writestr("archive/version", "3\n")
    with pytest.raises(pickle.UnpicklingError, match="refuses global"):
        load_torch_checkpoint(p)


def test_reader_rejects_non_checkpoint_zip(tmp_path):
    p = str(tmp_path / "not_ckpt.zip")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("whatever.txt", "hi")
    with pytest.raises(ValueError, match="data.pkl"):
        load_torch_checkpoint(p)


def test_regime_gan_reference_layout_roundtrip(tmp_path):
    """The reference's artifact dir (meta.json + gen_regime_{k}.pt,
    regime_gan.py:233-280) round-trips through save/load with the
    parametric-fallback slot (missing .pt) preserved."""
    from synthetic_datagen_spark.regime import (
        RegimeGanModel,
        load_regime_gan,
        save_regime_gan,
    )

    rng = np.random.default_rng(5)
    model = RegimeGanModel(
        n_regimes=3,
        seq_len=8,
        trans=np.array([[0.8, 0.1, 0.1], [0.2, 0.7, 0.1], [0.3, 0.3, 0.4]]),
        start=np.array([0.5, 0.3, 0.2]),
        stats={
            0: {"n": 100, "mu": 0.0, "sigma": 0.01, "skew": 0.0, "ar1": 0.1},
            1: {"n": 50, "mu": 0.001, "sigma": 0.02, "skew": 0.2, "ar1": 0.0},
            2: {"n": 3, "mu": 0.0, "sigma": 0.005, "skew": 0.0, "ar1": 0.0},
        },
        decoders={
            0: {"w": rng.normal(size=(4, 8)), "b": np.zeros(8), "mean": 0.0, "std": 0.01},
            1: {"w": rng.normal(size=(4, 8)), "b": np.ones(8) * 0.1, "mean": 0.002, "std": 0.02},
            # regime 2: sparse — no decoder, parametric fallback
        },
        latent_dim=4,
    )
    path = str(tmp_path / "regime_gan_model")
    save_regime_gan(model, path)
    import os

    assert os.path.exists(os.path.join(path, "meta.json"))
    assert os.path.exists(os.path.join(path, "gen_regime_0.pt"))
    assert not os.path.exists(os.path.join(path, "gen_regime_2.pt"))

    back = load_regime_gan(path)
    assert back.n_regimes == 3 and back.seq_len == 8 and back.latent_dim == 4
    assert np.allclose(back.trans, model.trans)
    assert np.allclose(back.start, model.start)
    assert set(back.decoders) == {0, 1}
    for k in (0, 1):
        assert np.array_equal(back.decoders[k]["w"], model.decoders[k]["w"]), k
        assert back.decoders[k]["std"] == model.decoders[k]["std"]
    assert back.stats[2]["sigma"] == 0.005


# ------------------------------------------------- golden interchange --
GOLDEN_PT = "tests/golden/gen_regime_0.pt"


def _reference_generator_ckpt():
    """The 4-Linear reference Generator (regime_gan.py:128-144) as a
    state_dict a real torch writer would emit: keys net.0/2/4/6.*,
    float32, torch (out, in) orientation. Fixed seed — the golden file
    was produced from exactly this object."""
    rng = np.random.default_rng(123)
    dims = [(5, 3), (5, 5), (5, 5), (8, 5)]
    sd = OrderedDict()
    for (out, inp), idx in zip(dims, (0, 2, 4, 6)):
        sd[f"net.{idx}.weight"] = rng.normal(0, 0.5, (out, inp)).astype(np.float32)
        sd[f"net.{idx}.bias"] = rng.normal(0, 0.1, out).astype(np.float32)
    return {"state_dict": sd, "data_mean": 0.001, "data_std": 0.02}


def test_golden_checkpoint_writer_byte_stable(tmp_path):
    """Writer refactors may not change the byte layout: re-serializing
    the fixed object reproduces the checked-in golden file exactly
    (fixed zip timestamps make the bytes a pure function of the object
    graph)."""
    import zipfile

    p = str(tmp_path / "regen.pt")
    save_torch_checkpoint(_reference_generator_ckpt(), p)
    golden = open(GOLDEN_PT, "rb").read()
    assert open(p, "rb").read() == golden
    names = zipfile.ZipFile(GOLDEN_PT).namelist()
    assert names[0] == "archive/data.pkl"
    assert "archive/version" in names and "archive/byteorder" in names
    assert sum(n.startswith("archive/data/") for n in names) == 8


def test_golden_reference_deep_generator_loads(tmp_path):
    """ADVICE r3 closure: a reference-architecture artifact (deep net.*
    Generator) loads through load_regime_gan — keys map with
    transposition, the forward pass runs LeakyReLU/LeakyReLU/Tanh/
    Linear — and drives generation."""
    import json
    import os
    import shutil

    from synthetic_datagen_spark.regime.regime_gan import (
        _decode_z,
        load_regime_gan,
    )

    art = tmp_path / "ref_model"
    art.mkdir()
    shutil.copy(GOLDEN_PT, art / "gen_regime_0.pt")
    meta = {
        "n_regimes": 2,
        "transitions": [[0.9, 0.1], [0.2, 0.8]],
        "regime_stats": [
            {"n": 100, "mu": 0.0, "sigma": 0.01},
            {"n": 5, "mu": 0.001, "sigma": 0.02},
        ],
        "seq_len": 8,
        "z_dim": 3,
        "start": [0.7, 0.3],
    }
    (art / "meta.json").write_text(json.dumps(meta))

    back = load_regime_gan(str(art))
    assert set(back.decoders) == {0}
    dec = back.decoders[0]
    assert "net" in dec and len(dec["net"]) == 4
    assert dec["mean"] == 0.001 and dec["std"] == 0.02

    # forward parity against a hand-rolled numpy pass over the ORIGINAL
    # torch-orientation weights
    ck = _reference_generator_ckpt()
    sd = ck["state_dict"]
    z = np.random.default_rng(9).standard_normal(3)
    h = z
    for idx, act in ((0, "lrelu"), (2, "lrelu"), (4, "tanh"), (6, None)):
        h = h @ np.asarray(sd[f"net.{idx}.weight"], dtype=np.float64).T + np.asarray(
            sd[f"net.{idx}.bias"], dtype=np.float64
        )
        if act == "lrelu":
            h = np.where(h > 0, h, 0.2 * h)
        elif act == "tanh":
            h = np.tanh(h)
    assert np.allclose(_decode_z(dec, z), h, atol=1e-12)


def test_regime_gan_generate_from_reference_artifact(spark, tmp_path):
    """End-to-end: generation from a loaded reference-architecture
    artifact is deterministic and regime 0 uses the deep decoder."""
    import json
    import shutil

    from synthetic_datagen_spark.regime.regime_gan import load_regime_gan
    from synthetic_datagen_spark.regime import regime_gan_generate

    art = tmp_path / "ref_model"
    art.mkdir()
    shutil.copy(GOLDEN_PT, art / "gen_regime_0.pt")
    meta = {
        "n_regimes": 2,
        "transitions": [[0.9, 0.1], [0.2, 0.8]],
        "regime_stats": [
            {"n": 100, "mu": 0.0, "sigma": 0.01},
            {"n": 5, "mu": 0.001, "sigma": 0.02},
        ],
        "seq_len": 8,
        "z_dim": 3,
        "start": [1.0, 0.0],
    }
    (art / "meta.json").write_text(json.dumps(meta))
    model = load_regime_gan(str(art))
    a = regime_gan_generate(model, spark, seed=4, n_samples=32, n_series=2)
    b = regime_gan_generate(model, spark, seed=4, n_samples=32, n_series=2)
    ra = [(r.series_id, r.t, r.regime, r.price) for r in a.orderBy("series_id", "t").collect()]
    rb = [(r.series_id, r.t, r.regime, r.price) for r in b.orderBy("series_id", "t").collect()]
    assert ra == rb and len(ra) == 64
    assert all(np.isfinite(p) and p > 0 for *_, p in ra)


def test_unknown_architecture_degrades_to_parametric(tmp_path):
    """A state_dict with an unrecognized layer pattern must NOT raise —
    the slot degrades to the parametric fallback."""
    import json

    from synthetic_datagen_spark.regime.regime_gan import load_regime_gan

    art = tmp_path / "odd_model"
    art.mkdir()
    sd = OrderedDict(
        [
            ("net.0.weight", np.ones((4, 3), dtype=np.float32)),
            ("net.0.bias", np.zeros(4, dtype=np.float32)),
            ("net.3.weight", np.ones((8, 4), dtype=np.float32)),
            ("net.3.bias", np.zeros(8, dtype=np.float32)),
        ]
    )
    save_torch_checkpoint(
        {"state_dict": sd, "data_mean": 0.0, "data_std": 1.0},
        str(art / "gen_regime_0.pt"),
    )
    meta = {
        "n_regimes": 1,
        "transitions": [[1.0]],
        "regime_stats": [{"n": 10, "mu": 0.0, "sigma": 0.01}],
        "seq_len": 8,
        "z_dim": 3,
        "start": [1.0],
    }
    (art / "meta.json").write_text(json.dumps(meta))
    back = load_regime_gan(str(art))
    assert back.decoders == {}  # fallback, not a KeyError
