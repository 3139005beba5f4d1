"""Execute examples/examples.ipynb headlessly — the downstream-use contract
(the reference's examples.ipynb cell 4 recipe, SURVEY §2b #21) must not rot
(round-2 verdict #8). The notebook is self-contained (synthetic data), so
all code cells run in one shared namespace on CPU with the Agg backend."""

import json
import os

import matplotlib

matplotlib.use("Agg")


def test_examples_notebook_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "examples", "examples.ipynb")
    nb = json.load(open(path))
    code_cells = [
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    ]
    assert len(code_cells) >= 6, "notebook lost cells"
    ns: dict = {"__name__": "__notebook__"}
    cwd = os.getcwd()
    try:
        os.chdir(repo)  # the notebook's sys.path bootstrap expects repo cwd
        for i, src in enumerate(code_cells):
            try:
                exec(compile(src, f"examples.ipynb#cell{i}", "exec"), ns)
            except Exception as e:
                raise AssertionError(
                    f"notebook cell {i} failed: {type(e).__name__}: {e}\n"
                    f"--- cell source ---\n{src[:800]}"
                ) from e
    finally:
        os.chdir(cwd)

    # spot-check the contract artifacts the cells are supposed to produce
    assert "recon" in ns and "rotated" in ns
    assert "decode" in ns, "serving-export cell did not define the loader"
