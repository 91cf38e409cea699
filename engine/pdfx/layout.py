"""P2 — layout ordering policy (frozen; SURVEY.md §2.2 P2).

Reading-order reconstruction from positioned runs, pdfminer-in-spirit:

1. Runs cluster into **columns** by x-start: sorted distinct x positions
   whose neighbors differ by more than ``COLUMN_GAP_PT`` start new columns.
2. Within a column, runs sort by (-y, x); runs whose y differ by less than
   ``LINE_Y_TOL`` form one **line** (joined in x order, no separator).
3. Consecutive lines with vertical gap ≤ ``BLOCK_GAP_PT`` form a **block**.
4. Blocks across all columns sort by (-top_y, column_x) — interleaving
   same-height columns left-to-right, which is the frozen policy the golden
   fixtures pin (SURVEY.md §2.2 P2: sort by (page, -y, x)).

Separators (P3, pdfminer policy): '\\n' lines, '\\n\\n' blocks, '\\x0c' pages.
"""

from __future__ import annotations

from engine.pdfx.content import TextRun

COLUMN_GAP_PT = 100.0  # x-start clusters farther apart than this = new column
LINE_Y_TOL = 0.5
BLOCK_GAP_PT = 20.0


def page_blocks(runs: list[TextRun]) -> list[tuple[float, float, list[str]]]:
    """Runs → [(top_y, column_x, [line, ...])] in reading order."""
    if not runs:
        return []
    # 1. column clustering by x-start
    xs = sorted({r.x for r in runs})
    col_of_x: dict[float, int] = {}
    col_x0: list[float] = []
    for x in xs:
        if not col_x0 or x - col_x0[-1][1] > COLUMN_GAP_PT:
            col_x0.append((x, x))
            col_of_x[x] = len(col_x0) - 1
        else:
            anchor, _ = col_x0[-1]
            col_x0[-1] = (anchor, x)
            col_of_x[x] = len(col_x0) - 1

    # 2./3. per-column lines and blocks
    blocks: list[tuple[float, float, list[str]]] = []
    for ci, (anchor, _) in enumerate(col_x0):
        col_runs = sorted(
            (r for r in runs if col_of_x[r.x] == ci), key=lambda r: (-r.y, r.x)
        )
        lines: list[tuple[float, str]] = []
        for r in col_runs:
            if lines and abs(lines[-1][0] - r.y) <= LINE_Y_TOL:
                lines[-1] = (lines[-1][0], lines[-1][1] + r.text)
            else:
                lines.append((r.y, r.text))
        cur: list[str] = []
        top_y = None
        prev_y = None
        for y, text in lines:
            if cur and prev_y is not None and (prev_y - y) > BLOCK_GAP_PT:
                blocks.append((top_y, anchor, cur))
                cur = []
                top_y = None
            if top_y is None:
                top_y = y
            cur.append(text)
            prev_y = y
        if cur:
            blocks.append((top_y, anchor, cur))

    # 4. global block order
    blocks.sort(key=lambda b: (-b[0], b[1]))
    return blocks
