"""Headless execution of the visualization notebook — the reference treats
its notebooks as de-facto integration tests (SURVEY §4); ours actually runs
in CI: synthetic dataset -> train -> predict -> evaluator -> contour image
-> widget browsers, end to end."""
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_visualizations_notebook_executes(monkeypatch):
    import nbformat
    from nbclient import NotebookClient

    # the kernel is a subprocess: force plain CPU jax there (drop the axon
    # platform plugin activation, as in test_multihost_launcher)
    import os

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setenv("PYTHONPATH", os.pathsep.join(
        [str(REPO)] + [p for p in
                       os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]))

    nb_path = REPO / "notebooks" / "visualizations.ipynb"
    nb = nbformat.read(nb_path, as_version=4)
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": str(REPO / "notebooks")}})
    client.execute()  # raises CellExecutionError on any failing cell

    executed = [c for c in nb.cells if c.cell_type == "code"]
    assert all(c.execution_count is not None for c in executed)
    # the dice assertion cell ran (its print reached stdout)
    text = "".join(
        "".join(o.get("text", "") for o in c.get("outputs", [])
                if o.get("output_type") == "stream")
        for c in executed)
    assert "validation dice after 16 iterations" in text
