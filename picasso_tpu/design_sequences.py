"""picasso_tpu.design_sequences — canonical DNA sequences for
rectangular Rothemund origami (RRO) designs.

The tables hold published scientific data: the standard RRO staple set
(Rothemund, Nature 2006 layout as used in DNA-PAINT origami designs)
and the canonical P1..P10 / RX DNA-PAINT docking handle sequences.
They are shipped as CSV data files and loaded here (capability parity
with picasso/design_sequences.py, which inlines the same canonical
tables in code).
"""

from __future__ import annotations

import csv
import os

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def _load_table(name: str) -> list[list[str]]:
    with open(os.path.join(_DATA_DIR, name), newline="") as f:
        return [row for row in csv.reader(f)]


# [Position, Name, Sequence] rows with a header row, matching the
# reference table layout.
base_sequences = _load_table("base_sequences.csv")

# [Shortname, Handlesequence] rows with a header row.
paint_sequences = _load_table("paint_sequences.csv")


def get_paint_sequence(shortname: str) -> str:
    """Look up a DNA-PAINT handle sequence by its short name (e.g.
    'P1')."""
    for row in paint_sequences[1:]:
        if row[0] == shortname:
            return row[1]
    raise KeyError(f"Unknown PAINT sequence name: {shortname}")
