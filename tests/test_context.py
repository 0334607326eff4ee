"""Context registry edge cases: refs, mutation guards, config export."""
import numpy as np
import pytest

import segmentation_pipeline_tpu as sp
from segmentation_pipeline_tpu.training.context import Ref


class _Widget:
    def __init__(self, size, label="w", other=None):
        self.size = size
        self.label = label
        self.other = other
        self._state = {"counter": 0}

    def state_dict(self):
        return dict(self._state)

    def load_state_dict(self, state):
        self._state = dict(state)


class TestContext:
    def test_ref_resolution(self):
        ctx = sp.Context(name="t")
        ctx.add_component("a", _Widget, size=1)
        ctx.add_component("b", _Widget, size=2, other=Ref("a"))
        ctx.init_components()
        assert ctx.b.other is ctx.a

    def test_ref_attribute(self):
        ctx = sp.Context(name="t")
        ctx.add_component("a", _Widget, size=7)
        ctx.add_component("b", _Widget, size=2, other=Ref("a", "size"))
        ctx.init_components()
        assert ctx.b.other == 7

    def test_env_expansion_and_variables(self, tmp_path, monkeypatch):
        ctx = sp.Context(name="t", variables={"MY_TEST_ROOT": str(tmp_path)})
        ctx.add_component("a", _Widget, size=1, label="$MY_TEST_ROOT/x")
        ctx.init_components()
        assert ctx.a.label == f"{tmp_path}/x"

    def test_mutation_after_init_raises(self):
        ctx = sp.Context(name="t")
        ctx.add_component("a", _Widget, size=1)
        ctx.init_components()
        with pytest.raises(RuntimeError):
            ctx.add_component("b", _Widget, size=2)
        with pytest.raises(RuntimeError):
            ctx.update_component("a", size=3)

    def test_update_and_remove(self):
        ctx = sp.Context(name="t")
        ctx.add_component("a", _Widget, size=1)
        ctx.add_component("b", _Widget, size=2)
        ctx.update_component("a", size=5)
        ctx.remove_component("b")
        ctx.init_components()
        assert ctx.a.size == 5
        assert not hasattr(ctx, "b")

    def test_save_load_state_and_function_param(self, tmp_path):
        def scorer(d):  # module-unimportable local function -> cloudpickle path
            return d["x"] * 2

        ctx = sp.Context(name="t", variables={"SOME_VAR": "v"})
        ctx.add_component("a", _Widget, size=1, other=scorer)
        ctx.init_components()
        ctx.a._state["counter"] = 42
        path = tmp_path / "ctx.ckpt"
        ctx.save(path)

        restored = sp.Context(file_path=str(path), variables={"SOME_VAR": "v"})
        restored.init_components()
        assert restored.a._state["counter"] == 42
        assert restored.a.other({"x": 3}) == 6

    def test_get_config_flattens(self):
        ctx = sp.Context(name="t")
        ctx.add_component("a", _Widget, size=3, label="hello")
        cfg = ctx.get_config()
        assert cfg["a.size"] == 3
        assert cfg["a.label"] == "hello"


class TestOrbaxArrayStorage:
    def test_orbax_checkpoint_roundtrip(self, tmp_path):
        """array_storage='orbax' splits state arrays into an OCDBT store and
        Context(file_path=...) restores them transparently."""
        import numpy as np

        import segmentation_pipeline_tpu as sp

        ctx = sp.Context(name="orb", variables={})
        ctx.add_component("model", sp.NestedResUNet, input_channels=1,
                          output_channels=2, filters=4)
        ctx.init_components()
        ctx.model.ensure_initialized(np.zeros((1, 1, 16, 16, 8), np.float32))
        p0 = np.asarray(ctx.model.params["out_conv"]["bias"])

        path = tmp_path / "ck.ckpt"
        ctx.save(path, array_storage="orbax")
        assert (tmp_path / "ck.ckpt.arrays").exists()
        # the pickle envelope must stay tiny (arrays live in the store)
        assert path.stat().st_size < 100_000

        ctx2 = sp.Context(file_path=str(path))
        ctx2.init_components()
        np.testing.assert_array_equal(
            np.asarray(ctx2.model.params["out_conv"]["bias"]), p0)

    def test_filelogger_orbax_saves(self, tmp_path):
        import numpy as np

        import segmentation_pipeline_tpu as sp
        from segmentation_pipeline_tpu.loggers import FileLogger

        ctx = sp.Context(name="orb2", variables={})
        ctx.add_component("model", sp.NestedResUNet, input_channels=1,
                          output_channels=2, filters=4)
        ctx.init_components()
        ctx.model.ensure_initialized(np.zeros((1, 1, 16, 16, 8), np.float32))
        logger = FileLogger(str(tmp_path), array_storage="orbax")
        logger.setup(ctx)
        path = logger.save_context(ctx, "checkpoints/", 0)
        logger.close()
        assert (str(path) + ".arrays") and (path.parent /
                                            (path.name + ".arrays")).exists()
        ctx2 = sp.Context(file_path=str(path))
        ctx2.init_components()
        np.testing.assert_array_equal(
            np.asarray(ctx2.model.params["out_conv"]["bias"]),
            np.asarray(ctx.model.params["out_conv"]["bias"]))
