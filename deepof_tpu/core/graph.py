"""Body-graph construction for deepof_tpu.

Static skeleton topology (nodes/edges/bridges/area polygons) derived ONCE per
project and lowered to index arrays, so that all per-frame math downstream is
batched tensor gathers instead of per-DataFrame loops.

Behavioral parity targets (reference, studied not copied):
  - deepof/utils.py:416-510  (connect_mouse presets + inter-animal edges)
  - deepof/utils.py:531-546  (enumerate_all_bridges)
  - deepof/data.py:1177-1191 (area polygon definitions)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import combinations
from typing import Dict, List, Optional, Sequence, Tuple

import networkx as nx
import numpy as np

# Skeleton presets: node -> list of neighbors. Same topology as the DLC
# topview mouse models supported by the reference (deepof/utils.py:441-468).
GRAPH_PRESETS: Dict[str, Dict[str, List[str]]] = {
    "deepof_14": {
        "Nose": ["Left_ear", "Right_ear"],
        "Spine_1": ["Center", "Left_ear", "Right_ear"],
        "Center": ["Left_fhip", "Right_fhip", "Spine_2"],
        "Spine_2": ["Left_bhip", "Right_bhip", "Tail_base"],
        "Tail_base": ["Tail_1"],
        "Tail_1": ["Tail_2"],
        "Tail_2": ["Tail_tip"],
    },
    "deepof_11": {
        "Nose": ["Left_ear", "Right_ear"],
        "Spine_1": ["Center", "Left_ear", "Right_ear"],
        "Center": ["Left_fhip", "Right_fhip", "Spine_2"],
        "Spine_2": ["Left_bhip", "Right_bhip", "Tail_base"],
    },
    "deepof_8": {
        "Nose": ["Left_ear", "Right_ear"],
        "Center": ["Left_fhip", "Right_fhip", "Tail_base", "Left_ear", "Right_ear"],
        "Tail_base": ["Tail_tip"],
    },
}

# Area polygons (reference: deepof/data.py:1179-1196). Order of vertices is
# load-bearing for the shoelace formula on non-convex paths.
AREA_POLYGONS: Dict[str, List[str]] = {
    "head_area": ["Nose", "Left_ear", "Left_fhip", "Spine_1"],
    "torso_area": ["Spine_1", "Right_fhip", "Spine_2", "Left_fhip"],
    "back_area": ["Spine_1", "Right_bhip", "Spine_2", "Left_bhip"],
    "full_area": [
        "Nose", "Left_ear", "Left_fhip", "Left_bhip",
        "Tail_base", "Right_bhip", "Right_fhip", "Right_ear",
    ],
}


def connect_mouse(
    animal_ids=None,
    exclude_bodyparts: Optional[List[str]] = None,
    graph_preset: str = "deepof_14",
) -> nx.Graph:
    """Build the skeleton connectivity graph for one or more animals.

    Multi-animal graphs get each node prefixed with ``{animal_id}_`` and are
    inter-connected Nose<->Nose, Tail_base<->Tail_base and Nose<->Tail_base in
    both directions (reference semantics, deepof/utils.py:495-508).

    Args:
        animal_ids: None, a single id string, or a list of id strings.
        exclude_bodyparts: node names (un-prefixed) to drop from each animal.
        graph_preset: "deepof_14" | "deepof_11" | "deepof_8", or an adjacency
            dict for custom labelling schemes.
    """
    if animal_ids is None:
        animal_ids = [""]
    if not isinstance(animal_ids, list):
        animal_ids = [animal_ids]

    graphs = []
    for aid in animal_ids:
        if isinstance(graph_preset, str):
            adjacency = GRAPH_PRESETS[graph_preset]
        else:
            adjacency = graph_preset
        g = nx.Graph(adjacency)

        exclude = exclude_bodyparts
        if aid:
            nx.relabel_nodes(g, {n: f"{aid}_{n}" for n in g.nodes()}, copy=False)
            if exclude_bodyparts is not None:
                exclude = [f"{aid}_{e}" for e in exclude_bodyparts]
        if exclude is not None:
            g.remove_nodes_from(exclude)
        graphs.append(g)

    graph = graphs[0]
    for g in graphs[1:]:
        graph = nx.compose(graph, g)

    for a, b in combinations(animal_ids, 2):
        graph.add_edge(f"{a}_Nose", f"{b}_Nose")
        graph.add_edge(f"{a}_Tail_base", f"{b}_Tail_base")
        graph.add_edge(f"{a}_Nose", f"{b}_Tail_base")
        graph.add_edge(f"{b}_Nose", f"{a}_Tail_base")

    return graph


def enumerate_all_bridges(graph: nx.Graph) -> List[List[str]]:
    """All 3-node connected paths (a-center-b) in the graph.

    Reference semantics: deepof/utils.py:531-546 — for every node of degree
    >=2, all unordered neighbor pairs, in neighbor-insertion order.
    """
    bridges = []
    for center, deg in nx.degree(graph):
        if deg >= 2:
            for a, b in combinations(list(graph[center]), 2):
                bridges.append([a, center, b])
    return bridges


@dataclass(frozen=True)
class BodyGraph:
    """Static skeleton lowered to index arrays for batched tensor kernels.

    Attributes:
        nodes: body-part names, in the canonical (table column) order.
        edges: (E, 2) int array of node indices, one row per skeleton edge.
        edge_names: sorted-tuple names matching the reference's distance
            column convention ``(bp1, bp2)``.
        bridges: (A, 3) int array of (a, center, b) node-index trios.
        bridge_names: 3-tuples naming each bridge.
        adjacency: (N, N) float adjacency matrix in node order.
        area_polys: per animal-id, dict of area name -> node-index array.
        animal_ids: list of animal id prefixes ("" for single-animal).
    """

    nodes: Tuple[str, ...]
    edges: np.ndarray
    edge_names: Tuple[Tuple[str, str], ...]
    bridges: np.ndarray
    bridge_names: Tuple[Tuple[str, str, str], ...]
    adjacency: np.ndarray
    area_polys: Dict[str, Dict[str, np.ndarray]] = field(default_factory=dict)
    animal_ids: Tuple[str, ...] = ("",)
    graph: nx.Graph = None

    @property
    def n_nodes(self) -> int:
        return len(self.nodes)

    @property
    def n_edges(self) -> int:
        return len(self.edge_names)

    def node_index(self, name: str) -> int:
        return self.nodes.index(name)


def build_body_graph(
    bodyparts: Sequence[str],
    animal_ids: Optional[Sequence[str]] = None,
    graph_preset: str = "deepof_14",
    exclude_bodyparts: Optional[List[str]] = None,
) -> BodyGraph:
    """Lower the skeleton graph to index arrays against a node ordering.

    Args:
        bodyparts: the body parts actually present in the tables (prefixed
            with animal id for multi-animal projects), in column order.
        animal_ids: animal id prefixes; [""] for single animal.
        graph_preset: skeleton preset name or custom adjacency dict.
        exclude_bodyparts: parts to drop.
    """
    if animal_ids is None or len(animal_ids) == 0:
        animal_ids = [""]
    animal_ids = list(animal_ids)

    graph = connect_mouse(
        animal_ids if animal_ids != [""] else None,
        exclude_bodyparts=exclude_bodyparts,
        graph_preset=graph_preset,
    )

    nodes = tuple(bp for bp in bodyparts if bp in graph.nodes)
    idx = {n: i for i, n in enumerate(nodes)}

    # Edges: only those with both endpoints present; named as sorted tuples
    # to match the reference distance-column convention.
    edge_rows, edge_names = [], []
    for a, b in graph.edges():
        if a in idx and b in idx:
            na, nb = sorted((a, b))
            edge_rows.append((idx[na], idx[nb]))
            edge_names.append((na, nb))
    order = np.argsort([f"{a}|{b}" for a, b in edge_names], kind="stable")
    edges = np.asarray(edge_rows, dtype=np.int32)[order]
    edge_names = tuple(edge_names[i] for i in order)

    # Bridges: enumerated from each animal's own single-animal graph, so the
    # neighbor-insertion order (and thus angle column order) matches the
    # reference's per-animal connectivity dict (deepof/data.py:1113-1117).
    bridge_rows, bridge_names = [], []
    for aid in animal_ids:
        sub = connect_mouse(
            aid if aid else None,
            exclude_bodyparts=exclude_bodyparts,
            graph_preset=graph_preset,
        )
        for a, c, b in enumerate_all_bridges(sub):
            if a in idx and b in idx and c in idx:
                bridge_rows.append((idx[a], idx[c], idx[b]))
                bridge_names.append((a, c, b))
    bridges = (
        np.asarray(bridge_rows, dtype=np.int32)
        if bridge_rows
        else np.zeros((0, 3), dtype=np.int32)
    )

    adjacency = np.zeros((len(nodes), len(nodes)), dtype=np.float32)
    for (i, j) in edges:
        adjacency[i, j] = adjacency[j, i] = 1.0

    # Area polygons per animal, only the fully-present ones; full_area keeps
    # available vertices when >=3 remain (reference: data.py:1230-1234).
    area_polys: Dict[str, Dict[str, np.ndarray]] = {}
    for aid in animal_ids:
        polys = {}
        for area_name, pattern in AREA_POLYGONS.items():
            named = [f"{aid}_{bp}" if aid else bp for bp in pattern]
            if area_name == "full_area":
                named = [bp for bp in named if bp in idx]
                if len(named) < 3:
                    continue
            elif not all(bp in idx for bp in named):
                continue
            polys[area_name] = np.asarray([idx[bp] for bp in named], dtype=np.int32)
        area_polys[aid] = polys

    return BodyGraph(
        nodes=nodes,
        edges=edges if len(edges) else np.zeros((0, 2), dtype=np.int32),
        edge_names=edge_names,
        bridges=bridges,
        bridge_names=tuple(bridge_names),
        adjacency=adjacency,
        area_polys=area_polys,
        animal_ids=tuple(animal_ids),
        graph=graph,
    )
