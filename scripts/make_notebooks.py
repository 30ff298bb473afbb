#!/usr/bin/env python
"""Generate notebooks/ from the cell-marked example scripts.

The reference ships 5 Jupyter notebooks (reference: notebooks/01..05*.ipynb).
Here each notebook's SOURCE OF TRUTH is an executable script in examples/
(`nb_*.py`, `# %%` cell markers) so the suite can actually run what the
notebooks show; this tool converts them to .ipynb with nbformat.

    python scripts/make_notebooks.py            # writes notebooks/*.ipynb
    python scripts/make_notebooks.py --check    # verify notebooks are in sync
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CELL = "# %%"
MD = "# %% [markdown]"


def parse_cells(path: str):
    """Split a `# %%`-marked script into (kind, source) cells."""
    cells = []
    kind, buf = None, []

    def flush():
        if kind is None:
            return
        text = "\n".join(buf).strip("\n")
        if text:
            cells.append((kind, text))

    with open(path) as f:
        for line in f.read().splitlines():
            if line.startswith(MD):
                flush()
                kind, buf = "markdown", []
            elif line.startswith(CELL):
                flush()
                kind, buf = "code", []
            else:
                if kind == "markdown":
                    buf.append(line[2:] if line.startswith("# ") else
                               line[1:] if line.startswith("#") else line)
                else:
                    buf.append(line)
    flush()
    return cells


def to_notebook(path: str):
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.metadata["language_info"] = {"name": "python"}
    for i, (kind, src) in enumerate(parse_cells(path)):
        if kind == "markdown":
            cell = nbformat.v4.new_markdown_cell(src)
        else:
            cell = nbformat.v4.new_code_cell(src)
        cell["id"] = f"cell-{i:03d}"  # deterministic output (sync check diffs)
        nb.cells.append(cell)
    return nb


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true",
                   help="exit 1 if notebooks/ is out of sync with examples/")
    p.add_argument("--out-dir", default=os.path.join(REPO, "notebooks"))
    args = p.parse_args()

    import nbformat

    sources = sorted(glob.glob(os.path.join(REPO, "examples", "nb_*.py")))
    if not sources:
        print("no examples/nb_*.py found", file=sys.stderr)
        return 1
    os.makedirs(args.out_dir, exist_ok=True)
    stale = []
    for src in sources:
        name = os.path.basename(src)[3:-3] + ".ipynb"  # nb_01_x.py -> 01_x.ipynb
        out = os.path.join(args.out_dir, name)
        nb = to_notebook(src)
        text = nbformat.writes(nb) + "\n"
        if args.check:
            if not os.path.exists(out) or open(out).read() != text:
                stale.append(out)
        else:
            with open(out, "w") as f:
                f.write(text)
            print(f"wrote {out} ({len(nb.cells)} cells)")
    if stale:
        print("out of sync (run scripts/make_notebooks.py):", *stale,
              sep="\n  ", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
