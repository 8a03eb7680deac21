"""Tree-format utilities: newick -> graphviz, .gv parsing, cell collapsing.

Reference: libs/utils.py:295-424. Standalone helpers for visualizing
simulation trees; not on the inference path.
"""

from __future__ import annotations

import os
import re

import numpy as np

DOT_HEADER = (
    "digraph G {\n"
    'node [width=0.75 fillcolor="#a6cee3", style=filled, fontcolor=black, '
    'shape=circle, fontsize=20, fontname="arial", fixedsize=True];\n'
)

DOT_CELLS = (
    'node [width=0.5, fillcolor="#e8bdc9", fontcolor=black, '
    'style=filled, shape=square, fontsize=8, fontname="arial", '
    "fixedsize=True];\n"
)


def write_file(path, content, append=False):
    mode = "a" if append and os.path.exists(path) else "w"
    with open(path, mode) as fh:
        fh.write(str(content))


def newick_to_gv(in_file, out_file=""):
    """Convert a newick tree file to graphviz (libs/utils.py:295-305)."""
    with open(in_file) as fh:
        tree = fh.read().strip().rstrip(";")
    edges, cells = edges_from_newick(tree)
    gv_tree = edges_to_gv(edges, cells)
    if out_file:
        write_file(out_file, gv_tree)
        return None
    return gv_tree


def edges_from_newick(data: str):
    """Parse newick into (edges, cell names) (libs/utils.py:308-328)."""
    cells = sorted(re.findall(r"\w+cell\d*", data))
    for i, cell in enumerate(cells):
        data = data.replace(cell, f"C{i}")

    edges = []
    node_no = len(cells)
    while True:
        pairs = re.findall(r"\((C\d+):(0.\d+),(C\d+):(0.\d+)\)", data)
        if not pairs:
            break
        for pair in pairs:
            n1, d1, n2, d2 = pair
            edges.append((node_no, int(n1.lstrip("C")), float(d1)))
            edges.append((node_no, int(n2.lstrip("C")), float(d2)))
            data = data.replace(
                "({}:{},{}:{})".format(*pair), f"C{node_no}"
            )
            node_no += 1
    return edges, cells


def edges_from_gv(data: str):
    """Parse a .gv mutation tree into mutation edges + cell attachments
    (libs/utils.py:331-365)."""
    mut_edges, muts = [], set()
    cell_edges, cells = [], []

    for line in data.split(";\n")[1:-1]:
        edge_nodes = re.search(r"(\d+)\s+->\s+(\d+)", line)
        attachment = re.search(r"(\d+)\s+->\s+(s\d+)", line)
        single = re.search(r"(s?\d+)$", line)

        if edge_nodes:
            n_from = int(edge_nodes.group(1)) - 1
            n_to = int(edge_nodes.group(2)) - 1
            if n_from != -1 and n_to != -1:
                mut_edges.append((n_from, n_to))
            muts.update([n_from, n_to])
        if attachment:
            n_from = int(attachment.group(1)) - 1
            n_to = attachment.group(2)
            cell_edges.append((n_from, n_to))
            cells.append(n_to)
        elif single:
            node = single.group(1)
            if not node.startswith("s"):
                muts.add(int(node) - 1)
    return mut_edges, muts, cell_edges, cells


def edges_to_gv(edges, cells) -> str:
    """Render an edge list as graphviz with length-scaled labels
    (libs/utils.py:368-384)."""
    out = DOT_HEADER
    lengths = np.array([e[2] for e in edges])
    scaled = np.ceil(lengths / lengths.max() * 100).astype(int)
    for i, edge in enumerate(edges):
        try:
            n_to = cells[edge[1]]
        except IndexError:
            n_to = edge[1]
        out += f'{edge[0]} -> {n_to} [label="{" " * scaled[i]}"];\n'
    return out + "}"


def collapse_cells_on_tree(data_folder, out_file=""):
    """Collapse per-cell leaves into per-attachment summary nodes
    (libs/utils.py:387-424)."""
    with open(os.path.join(data_folder, "tree.gv")) as fh:
        tree_str = fh.read()
    mut_edges, _, cell_edges, _ = edges_from_gv(tree_str)

    grouped: dict[int, list] = {}
    for mut_from, cell_to in cell_edges:
        grouped.setdefault(mut_from, []).append(cell_to)

    out = DOT_HEADER
    for edge in mut_edges:
        out += "{} -> {};\n".format(*edge)
    out += DOT_CELLS
    for i, (mut_from, cells_to) in enumerate(grouped.items()):
        size = 0.5 + len(cells_to)
        out += f'{mut_from} -> s{i} [label="{size}", size={size}];\n'
    out += "}"

    if not out_file:
        out_file = os.path.join(data_folder, "tree_collapsed.gv")
    write_file(out_file, out)

    try:
        from graphviz import render

        render("dot", "png", out_file)
    except Exception:
        # graphviz or the dot binary may be missing/broken; the .gv file is
        # the contract, the .png is best-effort (the reference's gv_to_png
        # has the same failure mode, libs/dpmmIO.py:290-303).
        pass
    return out_file
