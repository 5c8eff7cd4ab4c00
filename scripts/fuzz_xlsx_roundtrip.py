"""Randomized round-trip fuzz for the stdlib XLSX codec (S3/S7 —
sources/xlsx.py), the last never-fuzzed IO surface.

Property: write_xlsx(columns, rows) → read_xlsx == the original cell
matrix under the dtype=str contract (str cells byte-identical incl.
leading zeros and leading/trailing whitespace; None cells None; int/
float/bool cells as their canonical string forms). The vocabulary is
adversarial for an OOXML codec: XML-special chars (&<>"'), ]]>,
newlines/tabs, unicode (CJK, emoji, combining accents, NBSP),
whitespace-only strings, very long strings, number-LOOKING strings
('001', '1e5', '=SUM(A1)') that must stay text, sparse None runs,
empty rows, 1-col and 40-col shapes. XML-1.0-illegal control chars
are excluded by design (no conforming codec can carry them).

Usage: python scripts/fuzz_xlsx_roundtrip.py [n_sheets] [seeds...]
Exit 0 iff every sheet round-trips exactly.
"""

from __future__ import annotations

import os
import random
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.sources.xlsx import read_xlsx, write_xlsx  # noqa: E402

ATOMS = [
    "plain", "001", "  leading", "trailing  ", " both ", "", " ",
    "a&b", "<tag>", "a<b>c</b>", '"quoted"', "it's", "]]>", "&amp;",
    "line1\nline2", "tab\there", "naïve", "œuvre", "日本語テキスト",
    "🙂🙃", "é combining", "nb sp", "1e5", "=SUM(A1)",
    "-0", "00.50", "NaN", "None", "null", "TRUE",
    "x" * 500,
]


def rand_cell(rng: random.Random):
    r = rng.random()
    if r < 0.12:
        return None
    if r < 0.18:
        return rng.randint(-10**9, 10**9)
    if r < 0.24:
        return rng.choice([0.5, -1.25, 3.0, 1e-4, 12345.6789])
    if r < 0.27:
        return rng.choice([True, False])
    if r < 0.75:
        return rng.choice(ATOMS)
    return "".join(rng.choice(ATOMS) for _ in range(rng.randint(2, 4)))


def expected_str(v) -> str | None:
    """The codec's documented dtype=str read contract: booleans come
    back 'True'/'False', integral numerics without a trailing .0
    (the pandas dtype=str shape), strings byte-identical."""
    if v is None:
        return None
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        txt = repr(v)
        if v.is_integer() and "e" not in txt.lower():
            return str(int(v))
        return txt
    return str(v)


def main() -> int:
    n_sheets = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    seeds = [int(s) for s in sys.argv[2:]] or [1, 23, 456]
    total_bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        bad = 0
        for si in range(n_sheets):
            ncols = rng.choice([1, 2, 3, 5, 8, 40])
            nrows = rng.randint(0, 30)
            cols = [f"c{j}_{rng.choice(['x', 'a&b', '<h>', 'é'])}" for j in range(ncols)]
            rows = [[rand_cell(rng) for _ in range(ncols)] for _ in range(nrows)]
            if nrows and rng.random() < 0.3:
                rows[rng.randrange(nrows)] = [None] * ncols  # empty row
            fd, path = tempfile.mkstemp(suffix=".xlsx")
            os.close(fd)
            try:
                write_xlsx(path, cols, rows,
                           freeze_header=rng.random() < 0.5,
                           autofilter=rng.random() < 0.5)
                got_cols, got_rows = read_xlsx(path)
            finally:
                os.unlink(path)
            if got_cols != [str(c) for c in cols]:
                bad += 1
                print(f"  seed {seed} sheet {si}: header diff {got_cols!r} vs {cols!r}")
                continue
            want = [[expected_str(v) for v in row] for row in rows]
            # the reader drops trailing all-None rows/cells only if the
            # writer emitted nothing for them — normalize both sides by
            # padding to the header width and row count
            norm_got = [list(r) + [None] * (ncols - len(r)) for r in got_rows]
            while len(norm_got) < len(want):
                norm_got.append([None] * ncols)
            if norm_got != want:
                for ri, (g, w) in enumerate(zip(norm_got, want)):
                    if g != w:
                        bad += 1
                        print(f"  seed {seed} sheet {si} row {ri}: {g!r} != {w!r}")
        print(f"seed {seed}: {n_sheets} sheets, {bad} mismatches")
        total_bad += bad
    print(f"\nXLSX ROUND-TRIP TOTAL mismatches: {total_bad}")
    return 0 if total_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
