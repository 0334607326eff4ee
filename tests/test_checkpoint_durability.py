"""Checkpoint durability: atomic snapshot writes + async-save draining.

The exit checkpoint is the SLURM-preemption story (ref
segmentation_trainer.py:279-280): a crash or kill mid-save must never leave
a truncated checkpoint in place of a previously good one, and train() must
not return while a save is still in flight.
"""
import pickle
import time

import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.loggers.file_logger import FileLogger
from segmentation_pipeline_tpu.training.context import Context


class _PoisonMidPickle:
    """Raises partway through pickling, after some bytes were produced."""

    def __reduce__(self):
        raise RuntimeError("simulated crash mid-serialization")


class TestAtomicSnapshot:
    def test_failed_write_preserves_previous_checkpoint(self, tmp_path):
        path = tmp_path / "run.ckpt"
        good = {"component_definitions": [], "version": 1}
        Context.write_snapshot(good, path)
        assert pickle.load(open(path, "rb")) == good

        bad = {"component_definitions": [], "poison": _PoisonMidPickle()}
        with pytest.raises(RuntimeError, match="simulated crash"):
            Context.write_snapshot(bad, path)

        # the previous durable checkpoint is intact and no temp junk remains
        assert pickle.load(open(path, "rb")) == good
        assert list(tmp_path.glob("*.tmp")) == []

    def test_interrupt_mid_save_leaves_loadable_checkpoint(self, tmp_path):
        """Simulate kill-during-write N times: whatever is on disk at the
        target path must always unpickle to a complete snapshot."""
        path = tmp_path / "run.ckpt"
        Context.write_snapshot({"component_definitions": [], "iter": 0}, path)

        real_open = open
        for fail_after in (0, 1):
            # an os.replace that dies before happening == process killed
            # between tmp write and rename; the tmp+replace protocol means
            # the prior file survives either way
            snap = {"component_definitions": [], "iter": fail_after + 1,
                    "blob": b"x" * 1_000_000}
            try:
                import os as _os

                orig_replace = _os.replace
                if fail_after == 0:
                    def dying_replace(a, b):
                        raise KeyboardInterrupt  # SIGINT mid-commit

                    _os.replace = dying_replace
                with pytest.raises(KeyboardInterrupt) if fail_after == 0 \
                        else _noop_ctx():
                    Context.write_snapshot(snap, path)
            finally:
                _os.replace = orig_replace
            loaded = pickle.load(real_open(path, "rb"))
            assert "component_definitions" in loaded  # complete snapshot
        assert pickle.load(open(path, "rb"))["iter"] == 2

    def test_orbax_storage_also_atomic_envelope(self, tmp_path):
        path = tmp_path / "run.ckpt"
        snap = {"component_definitions": [
            {"name": "m", "state_dict": {"w": __import__("numpy").ones(3)}}]}
        Context.write_snapshot(snap, path, array_storage="orbax")
        loaded = pickle.load(open(path, "rb"))
        assert loaded["array_storage"] == "orbax"
        assert (tmp_path / "run.ckpt.arrays").exists()
        assert list(tmp_path.glob("*.tmp")) == []


class _noop_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _MiniContext:
    """Just enough surface for FileLogger.save_context/setup."""

    name = "mini"

    def snapshot(self):
        return {"component_definitions": [], "stamp": "snap"}

    def save(self, filename, array_storage="pickle"):
        Context.write_snapshot(self.snapshot(), filename, array_storage)

    # Context classmethod indirection used by the async path
    write_snapshot = staticmethod(Context.write_snapshot)

    def get_config(self):
        return {}


class TestAsyncDrain:
    def test_close_drains_pending_async_save(self, tmp_path, monkeypatch):
        logger = FileLogger(str(tmp_path), async_saves=True)
        logger.setup(_MiniContext())

        orig = Context.write_snapshot
        writes = []

        def slow_write(checkpoint, filename, array_storage="pickle"):
            time.sleep(0.6)  # the slow disk write the trainer must outlive
            orig(checkpoint, filename, array_storage)
            writes.append(filename)

        # the async path dispatches through type(context).write_snapshot
        monkeypatch.setattr(_MiniContext, "write_snapshot",
                            staticmethod(slow_write))
        path = logger.save_context(_MiniContext(), "checkpoints/", 7)
        # returns immediately, write still in flight
        logger.close()  # must block until durable
        assert writes == [path]
        assert pickle.load(open(path, "rb"))["stamp"] == "snap"

    def test_close_idempotent_and_reusable_after_setup(self, tmp_path):
        logger = FileLogger(str(tmp_path), async_saves=True)
        logger.setup(_MiniContext())
        logger.close()
        logger.close()  # second close is a no-op
        logger.setup(_MiniContext())  # trainer re-entry reopens streams
        logger.log({"loss": 1.0, "iteration": 0})
        logger.close()

    def test_nonlogger_close_is_noop(self):
        sp.NonLogger().close()
