"""Headless execution of the notebooks — the reference treats its notebooks
as de-facto integration tests (SURVEY §4); ours actually run in CI:
visualizations (synthetic dataset -> train -> predict -> evaluator ->
contour image -> widget browsers) and ms-evaluation (offline
lesion-detection metric pipeline), end to end."""
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _execute(name: str, monkeypatch) -> str:
    import nbformat
    from nbclient import NotebookClient

    # the kernel is a subprocess: force plain CPU jax there (drop the axon
    # platform plugin activation, as in test_multihost_launcher)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setenv("PYTHONPATH", os.pathsep.join(
        [str(REPO)] + [p for p in
                       os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]))

    nb = nbformat.read(REPO / "notebooks" / name, as_version=4)
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": str(REPO / "notebooks")}})
    client.execute()  # raises CellExecutionError on any failing cell

    executed = [c for c in nb.cells if c.cell_type == "code"]
    assert all(c.execution_count is not None for c in executed)
    return "".join(
        "".join(o.get("text", "") for o in c.get("outputs", [])
                if o.get("output_type") == "stream")
        for c in executed)


@pytest.mark.slow
def test_visualizations_notebook_executes(monkeypatch):
    text = _execute("visualizations.ipynb", monkeypatch)
    # the dice assertion cell ran (its print reached stdout)
    assert "validation dice after 16 iterations" in text


@pytest.mark.slow
def test_ms_evaluation_notebook_executes(monkeypatch):
    text = _execute("ms-evaluation.ipynb", monkeypatch)
    assert "mean detection recall" in text


@pytest.mark.slow
def test_data_processing_notebook_executes(monkeypatch):
    text = _execute("data_processing.ipynb", monkeypatch)
    assert "subjects after ingestion: 9" in text
    # the reference contraction identity-check cell printed ~0
    assert "reference contraction" in text


@pytest.mark.slow
def test_hippo_shapes_notebook_executes(monkeypatch):
    text = _execute("hippo_shapes.ipynb", monkeypatch)
    assert "suggested training crop" in text


@pytest.mark.slow
def test_calc_quadratic_curve_notebook_executes(monkeypatch):
    text = _execute("calc_quadratic_curve.ipynb", monkeypatch)
    assert "mean |percent_diff| on the fitting cohort" in text


@pytest.mark.slow
def test_debugging_notebook_executes(monkeypatch):
    text = _execute("debugging_01.ipynb", monkeypatch)
    assert "resumed at iteration 4" in text
