"""ASCII transfer-DAG rendering + profiling summary.

The analogue of the reference's utils/dag_printer.cpp (boxes with
table name + formatted cardinality, edge labels parent_col/child_col,
gated by rpt_display_dag) and rpt_profiling.hpp's per-operator summary
(rows in/out, % removed, forward/backward rollups).
"""

from __future__ import annotations


def fmt_card(n: float) -> str:
    if n >= 1e9:
        return f"{n / 1e9:.1f}B"
    if n >= 1e6:
        return f"{n / 1e6:.1f}M"
    if n >= 1e3:
        return f"{n / 1e3:.1f}K"
    return str(int(n))


def render_tree(tree, rows_est: dict) -> str:
    """Indented tree with per-node cardinality and edge key labels."""
    children: dict = {}
    for child, (par, e) in tree.parent.items():
        children.setdefault(par, []).append((child, e))

    lines: list = []

    def walk(node, depth, edge):
        card = fmt_card(rows_est.get(node, 0))
        label = ""
        if edge is not None:
            pc = ",".join(edge.cols_of(edge.other(node)))
            cc = ",".join(edge.cols_of(node))
            label = f"  [{pc} = {cc}]"
        lines.append(f"{'    ' * depth}+- {node} ({card}){label}")
        for ch, e in sorted(children.get(node, []),
                            key=lambda t: rows_est.get(t[0], 0)):
            walk(ch, depth + 1, e)

    walk(tree.root, 0, None)
    return "\n".join(lines)


def _make_box(name_line: str, card_line: str) -> tuple:
    """([lines], center_col) — a bordered two-line box like the
    reference's MakeBox (dag_printer.cpp:24-36)."""
    w = max(len(name_line), len(card_line))
    lines = [
        "+" + "-" * (w + 2) + "+",
        "| " + name_line.ljust(w) + " |",
        "| " + card_line.ljust(w) + " |",
        "+" + "-" * (w + 2) + "+",
    ]
    return lines, (w + 4) // 2


def render_boxes(tree, rows_est: dict) -> str:
    """2-D box rendering of the transfer DAG: parent box centered over
    side-by-side child subtrees, connectors labeled parent_col /
    child_col — the analogue of the reference's RenderSubtree /
    PrintPhysicalDAG output (dag_printer.cpp:38-180), used for
    ``display_physical_dag`` parity."""
    children: dict = {}
    for child, (par, e) in tree.parent.items():
        children.setdefault(par, []).append((child, e))

    def subtree(node) -> tuple:
        card = fmt_card(rows_est.get(node, 0)) + " rows"
        box, box_center = _make_box(str(node), card)
        kids = sorted(children.get(node, []),
                      key=lambda t: rows_est.get(t[0], 0))
        if not kids:
            return box, box_center

        blocks, labels, centers, offsets = [], [], [], []
        gap, x = 4, 0
        for ch, e in kids:
            blines, bcenter = subtree(ch)
            pc = ",".join(e.cols_of(node))
            cc = ",".join(e.cols_of(ch))
            blocks.append(blines)
            labels.append(f"{pc} / {cc}")
            offsets.append(x)
            centers.append(x + bcenter)
            x += max(len(ln) for ln in blines) + gap
        total = x - gap

        mid = (centers[0] + centers[-1]) // 2
        shift = max(0, mid - box_center)
        out = [" " * shift + ln for ln in box]
        # connector row: | under the parent, labels over each child
        conn = [" "] * max(total, shift + len(box[0]))
        for c in centers:
            conn[c] = "|"
        out.append("".join(conn).rstrip())
        lab_row = [" "] * total
        for c, lab in zip(centers, labels):
            start = max(0, min(c - len(lab) // 2, total - len(lab)))
            lab_row[start:start + len(lab)] = lab
        out.append("".join(lab_row).rstrip())

        height = max(len(b) for b in blocks)
        for row in range(height):
            merged = ""
            for blines, off in zip(blocks, offsets):
                seg = blines[row] if row < len(blines) else ""
                merged = merged.ljust(off) + seg
            out.append(merged.rstrip())
        new_center = shift + box_center
        return out, new_center

    lines, _ = subtree(tree.root)
    return "\n".join(lines)


def profiling_summary(stats: list) -> str:
    """Per-step rows in/out + % removed, with forward/backward rollups
    (mirrors RPTProfilingState's QueryEnd table,
    rpt_profiling.hpp:114-216)."""
    lines = [f"{'phase':9s} {'build->probe':28s} {'rows_in':>10s} "
             f"{'rows_out':>10s} {'removed':>8s}"]
    roll = {"forward": [0, 0], "backward": [0, 0]}
    for st in stats:
        op = st.op
        if st.rows_in >= 0:
            pct = (100.0 * (st.rows_in - st.rows_out) / st.rows_in
                   if st.rows_in else 0.0)
            roll[op.phase][0] += st.rows_in
            roll[op.phase][1] += st.rows_out
            lines.append(
                f"{op.phase:9s} {op.build + '->' + op.probe:28s} "
                f"{st.rows_in:10d} {st.rows_out:10d} {pct:7.1f}%")
        else:
            lines.append(f"{op.phase:9s} {op.build + '->' + op.probe:28s} "
                         f"{'(lazy)':>10s}")
    for phase, (rin, rout) in roll.items():
        if rin:
            pct = 100.0 * (rin - rout) / rin
            lines.append(f"{phase} total: {rin} -> {rout} ({pct:.1f}% removed)")
    return "\n".join(lines)
