"""WandbLogger exercised against a stub wandb module (VERDICT round-1 item 2).

Covers every public method: run-id generation + resume (ref
wandb_logger.py:63-76), init retry loop (:88-94), metric summaries (:96-98),
source snapshot on first run only (:101-103), save_context checkpoint
upload (:107-120), to_wandb type dispatch (:20-32), and close().
"""
import pickle
import sys
import types

import numpy as np
import pytest


class _StubRun:
    def __init__(self, id, dir):
        self.id = id
        self.dir = dir


class _StubSettings:
    def __init__(self, **kwargs):
        self.kwargs = kwargs


class _StubTable:
    def __init__(self, dataframe=None):
        self.dataframe = dataframe


class _StubImage:
    def __init__(self, img):
        self.img = img


def make_stub_wandb(fail_inits: int = 0):
    """Stub wandb that models the REAL library's save semantics: ``save`` on
    a path outside the run dir creates a SYMLINK into the run dir, and the
    sync loop reads the bytes asynchronously — modeled here as reading at
    ``finish()`` — so an overwritten checkpoint uploads stale bytes. The
    reference reimplemented wandb.save as a copy for exactly this
    (ref wandb_logger.py:122-216)."""
    import os

    stub = types.ModuleType("wandb")
    stub.calls = {"init": [], "save": [], "log": [], "define_metric": [],
                  "finish": 0}
    stub._fail_inits = fail_inits
    stub.run = None
    stub._registered = []  # run-dir paths queued for the sync loop
    stub.uploaded = {}  # basename -> bytes the sync loop actually read

    def init(**kwargs):
        stub.calls["init"].append(kwargs)
        if stub._fail_inits > 0:
            stub._fail_inits -= 1
            raise ConnectionError("transient network failure")
        files_dir = os.path.join(kwargs.get("dir", "."), "wandb_files")
        os.makedirs(files_dir, exist_ok=True)
        stub.run = _StubRun(id=kwargs.get("id", "gen"), dir=files_dir)
        return stub.run

    def save(path, policy=None, base_path=None):
        stub.calls["save"].append((path, policy))
        run_dir = os.path.abspath(stub.run.dir)
        src = os.path.abspath(str(path))
        if src.startswith(run_dir + os.sep):
            dest = src  # already in the run dir: uploaded as-is
        else:
            # real wandb.save: symlink the outside file into the run dir
            dest = os.path.join(run_dir, os.path.basename(src))
            if not os.path.lexists(dest):
                os.symlink(src, dest)
        stub._registered.append(dest)
        return [dest]

    def finish():
        # the async sync loop: bytes are read whenever it gets to them —
        # at the latest when the run finishes
        for dest in stub._registered:
            try:
                with open(dest, "rb") as f:
                    stub.uploaded[os.path.basename(dest)] = f.read()
            except OSError:
                stub.uploaded[os.path.basename(dest)] = None  # dangling link
        stub.calls["finish"] += 1

    stub.init = init
    stub.save = save
    stub.log = lambda d: stub.calls["log"].append(d)
    stub.define_metric = lambda name, summary=None: \
        stub.calls["define_metric"].append((name, summary))
    stub.finish = finish
    stub.Settings = _StubSettings
    stub.Table = _StubTable
    stub.Image = _StubImage
    util = types.ModuleType("wandb.util")
    util._n = 0

    def generate_id():
        util._n += 1
        return f"runid{util._n:04d}"

    util.generate_id = generate_id
    stub.util = util
    return stub


@pytest.fixture
def stub_wandb(monkeypatch):
    stub = make_stub_wandb()
    monkeypatch.setitem(sys.modules, "wandb", stub)
    return stub


class _Ctx:
    """Minimal context surface used by WandbLogger."""

    def __init__(self, tmp_path, name="exp"):
        self.name = name
        self.metadata = {}
        self.file_paths = []
        self._tmp = tmp_path

    def get_config(self):
        return {"model": {"filters": 4}}

    def save(self, filename, array_storage="pickle"):
        with open(filename, "wb") as f:
            pickle.dump({"component_definitions": [], "name": self.name}, f)


def _make_logger(stub, tmp_path, **kw):
    from segmentation_pipeline_tpu.loggers.wandb_logger import WandbLogger

    kw.setdefault("logs_dir", str(tmp_path / "logs"))
    kw.setdefault("retry_delay", 0.0)
    return WandbLogger("proj", **kw)


class TestSetup:
    def test_new_run_generates_id_and_names_run(self, stub_wandb, tmp_path):
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path)
        logger.setup(ctx)
        # id persisted into metadata => checkpoint carries the resume handle
        assert ctx.metadata["wandb_run_id"] == "runid0001"
        # readable run name: base + two words + id (ref :67-68)
        assert ctx.name.startswith("exp-") and ctx.name.endswith("runid0001")
        (init_kwargs,) = stub_wandb.calls["init"]
        assert init_kwargs["id"] == "runid0001"
        assert init_kwargs["name"] == ctx.name
        assert init_kwargs["config"] == {"model": {"filters": 4}}
        assert "resume" not in init_kwargs
        assert isinstance(init_kwargs["settings"], _StubSettings)
        assert init_kwargs["settings"].kwargs == {"symlink": False}

    def test_resume_reuses_id_and_skips_snapshot(self, stub_wandb, tmp_path):
        src = tmp_path / "config_source.py"
        src.write_text("# config")
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path, name="exp-amber-raven-oldid")
        ctx.metadata["wandb_run_id"] = "oldid"
        ctx.file_paths = [str(src)]
        logger.setup(ctx)
        (init_kwargs,) = stub_wandb.calls["init"]
        assert init_kwargs["id"] == "oldid"
        assert init_kwargs["resume"] == "allow"
        assert ctx.name == "exp-amber-raven-oldid"  # not renamed again
        # source snapshot is first-run only (ref :100-103)
        assert stub_wandb.calls["save"] == []

    def test_first_run_uploads_source_files(self, stub_wandb, tmp_path):
        src = tmp_path / "main_config.py"
        src.write_text("# config source")
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path)
        ctx.file_paths = [str(src), str(tmp_path / "missing.py")]
        logger.setup(ctx)
        saved = [p for p, _ in stub_wandb.calls["save"]]
        assert len(saved) == 1  # existing files only
        # uploaded via an in-run-dir COPY (not a symlink to the source)
        import os

        assert os.path.basename(saved[0]) == "main_config.py"
        assert os.path.dirname(saved[0]) == os.path.abspath(
            stub_wandb.run.dir)
        assert not os.path.islink(saved[0])
        assert open(saved[0], "rb").read() == src.read_bytes()

    def test_same_basename_sources_both_uploaded(self, stub_wandb, tmp_path):
        """Two file_paths sharing a basename (dmri_hippo/config.py and
        msseg2/config.py) must not overwrite each other in the run dir —
        both byte streams reach the upload, the second under a
        hash-disambiguated name."""
        a = tmp_path / "dmri_hippo" / "config.py"
        b = tmp_path / "msseg2" / "config.py"
        a.parent.mkdir()
        b.parent.mkdir()
        a.write_text("# dmri config")
        b.write_text("# msseg2 config")
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path)
        ctx.file_paths = [str(a), str(b)]
        logger.setup(ctx)
        saved = [p for p, _ in stub_wandb.calls["save"]]
        assert len(saved) == 2
        contents = {open(p, "rb").read() for p in saved}
        assert contents == {a.read_bytes(), b.read_bytes()}

    def test_metric_summaries_defined(self, stub_wandb, tmp_path):
        logger = _make_logger(stub_wandb, tmp_path)
        logger.setup(_Ctx(tmp_path))
        assert set(stub_wandb.calls["define_metric"]) == {
            ("*", "max"), ("*", "min"), ("*", "mean")}

    def test_group_in_save_folder(self, stub_wandb, tmp_path):
        logger = _make_logger(stub_wandb, tmp_path, group="ablation")
        ctx = _Ctx(tmp_path)
        logger.setup(ctx)
        parts = logger.save_folder.split("/")
        assert "proj" in parts and "ablation" in parts


class TestInitRetry:
    def test_retries_then_succeeds(self, monkeypatch, tmp_path):
        stub = make_stub_wandb(fail_inits=2)
        monkeypatch.setitem(sys.modules, "wandb", stub)
        logger = _make_logger(stub, tmp_path, init_retries=5)
        logger.setup(_Ctx(tmp_path))
        assert len(stub.calls["init"]) == 3
        assert logger.run is not None

    def test_exhausted_retries_raise(self, monkeypatch, tmp_path):
        stub = make_stub_wandb(fail_inits=99)
        monkeypatch.setitem(sys.modules, "wandb", stub)
        logger = _make_logger(stub, tmp_path, init_retries=3)
        with pytest.raises(RuntimeError, match="after retries"):
            logger.setup(_Ctx(tmp_path))
        assert len(stub.calls["init"]) == 3


class TestSaveContext:
    def test_writes_checkpoint_and_uploads(self, stub_wandb, tmp_path):
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path)
        logger.setup(ctx)
        stub_wandb.calls["save"].clear()
        path = logger.save_context(ctx, "checkpoints/", 42)
        assert path.exists()
        assert path.name == f"{ctx.name}-iter00000042.ckpt"
        loaded = pickle.load(open(path, "rb"))
        assert "component_definitions" in loaded
        ((saved, policy),) = stub_wandb.calls["save"]
        import os

        assert policy == "now"
        assert os.path.basename(saved) == path.name
        assert os.path.dirname(saved) == os.path.abspath(stub_wandb.run.dir)
        assert not os.path.islink(saved)

    def test_upload_bytes_captured_at_save_time(self, stub_wandb, tmp_path):
        """The symlink-staleness regression (VERDICT r2 #7): real wandb.save
        symlinks outside files and the sync loop reads the bytes later. If a
        checkpoint is overwritten after save_context, the uploaded bytes must
        still be the ones written AT save time — the copy-based _wandb_save
        guarantees it (direct wandb.save(path) fails this test)."""
        logger = _make_logger(stub_wandb, tmp_path)
        ctx = _Ctx(tmp_path)
        logger.setup(ctx)
        path = logger.save_context(ctx, "checkpoints/", 7)
        bytes_at_save = path.read_bytes()
        path.write_bytes(b"OVERWRITTEN-LATER")  # rotation / later re-save
        logger.close()  # sync loop drains on finish
        assert stub_wandb.uploaded[path.name] == bytes_at_save


class TestLog:
    def test_type_dispatch(self, stub_wandb, tmp_path):
        import pandas as pd
        from PIL import Image as PILImage

        from segmentation_pipeline_tpu.evaluators.labeled_tensor import LabeledTensor

        logger = _make_logger(stub_wandb, tmp_path)
        logger.setup(_Ctx(tmp_path))
        lt = LabeledTensor(np.ones((2, 2)), [["a", "b"], ["x", "y"]])
        payload = {
            "loss": 0.5,
            "table": pd.DataFrame({"dice": [0.9]}),
            "img": PILImage.new("RGB", (4, 4)),
            "nested": {"stats": lt},
        }
        logger.log(payload)
        (logged,) = stub_wandb.calls["log"]
        assert logged["loss"] == 0.5
        assert isinstance(logged["table"], _StubTable)
        assert isinstance(logged["img"], _StubImage)
        assert isinstance(logged["nested"]["stats"], dict)


class TestClose:
    def test_close_finishes_run_once(self, stub_wandb, tmp_path):
        logger = _make_logger(stub_wandb, tmp_path)
        logger.setup(_Ctx(tmp_path))
        logger.close()
        logger.close()
        assert stub_wandb.calls["finish"] == 1

    def test_missing_wandb_raises_clear_error(self, monkeypatch, tmp_path):
        import builtins

        real_import = builtins.__import__

        def no_wandb(name, *a, **kw):
            if name == "wandb":
                raise ImportError("No module named 'wandb'")
            return real_import(name, *a, **kw)

        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        monkeypatch.setattr(builtins, "__import__", no_wandb)
        from segmentation_pipeline_tpu.loggers.wandb_logger import WandbLogger

        with pytest.raises(ImportError, match="FileLogger"):
            WandbLogger("proj")
