"""CensNet graph convolution: co-embedding of nodes and edges.

TPU-first rebuild of the reference's CensNetConvPT
(deepof/clustering/censNetConv_pt.py:92-375). The graph operators
(GCN-normalized laplacian, line-graph laplacian, incidence matrix) are
precomputed ONCE on the host as static numpy constants — the skeleton never
changes — and the per-batch propagation is pure dense einsum/matmul, which
XLA maps straight onto the MXU (N, E are tiny: <= ~30 nodes/edges).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _degree_power(a: np.ndarray, k: float) -> np.ndarray:
    degrees = a.sum(axis=1)
    degrees[degrees == 0] = 1.0
    return np.diag(degrees**k)


def _normalized_adjacency(a: np.ndarray) -> np.ndarray:
    d = _degree_power(a, -0.5)
    return d @ a @ d


def gcn_filter(a: np.ndarray) -> np.ndarray:
    """Symmetric GCN normalization of A + I."""
    return _normalized_adjacency(a + np.eye(a.shape[0]))


def incidence_matrix(adjacency: np.ndarray) -> np.ndarray:
    """(N, E) incidence matrix; edges ordered by upper-triangular row-major
    scan of the adjacency (matches the sorted-edge feature order used by the
    graph dataset builder)."""
    upper = np.triu(adjacency)
    rows, cols = np.nonzero(upper)
    n = adjacency.shape[0]
    e = len(rows)
    inc = np.zeros((n, e))
    for k, (i, j) in enumerate(zip(rows, cols)):
        inc[i, k] = 1.0
        inc[j, k] = 1.0
    return inc


def line_graph(incidence: np.ndarray) -> np.ndarray:
    """Line-graph adjacency: edges are connected iff they share a node."""
    l = incidence.T @ incidence
    return l - 2 * np.eye(l.shape[-1])


def censnet_operators(adjacency: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(laplacian (N,N), edge_laplacian (E,E), incidence (N,E)) as static
    float32 constants."""
    adjacency = np.asarray(adjacency, dtype=np.float64)
    lap = gcn_filter(adjacency)
    inc = incidence_matrix(adjacency)
    edge_lap = gcn_filter(line_graph(inc))
    return (
        lap.astype(np.float32),
        edge_lap.astype(np.float32),
        inc.astype(np.float32),
    )


class CensNetConv(nn.Module):
    """One CensNet layer: propagate node features through an edge-weighted
    graph and edge features through a node-weighted line graph.

    Args (call):
        nodes: (B, N, F_n) node features.
        edges: (B, E, F_e) edge features.

    Attributes:
        node_channels / edge_channels: output feature sizes.
        operators: static (laplacian, edge_laplacian, incidence) triple.
    """

    node_channels: int
    edge_channels: int
    operators: Tuple[np.ndarray, np.ndarray, np.ndarray]
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, nodes: jnp.ndarray, edges: jnp.ndarray):
        lap, edge_lap, inc = (jnp.asarray(o, self.dtype) for o in self.operators)
        f_n = nodes.shape[-1]
        f_e = edges.shape[-1]

        node_kernel = self.param(
            "node_kernel", nn.initializers.xavier_uniform(), (f_n, self.node_channels)
        ).astype(self.dtype)
        edge_kernel = self.param(
            "edge_kernel", nn.initializers.xavier_uniform(), (f_e, self.edge_channels)
        ).astype(self.dtype)
        # Scalar mixing weights turning the opposite stream into a diagonal.
        node_weights = self.param(
            "node_weights", nn.initializers.xavier_uniform(), (f_n, 1)
        ).astype(self.dtype)
        edge_weights = self.param(
            "edge_weights", nn.initializers.xavier_uniform(), (f_e, 1)
        ).astype(self.dtype)

        # Node propagation: A_w = (inc @ diag(w_e) @ inc^T) * lap
        w_edge = jnp.squeeze(edges @ edge_weights, -1)              # (B, E)
        weighted_inc = inc[None] * w_edge[:, None, :]               # (B, N, E)
        node_adj = jnp.einsum("bne,me->bnm", weighted_inc, inc) * lap[None]
        node_out = jnp.einsum("bnm,bmf->bnf", node_adj, nodes) @ node_kernel

        # Edge propagation: L_w = (inc^T @ diag(w_n) @ inc) * edge_lap
        w_node = jnp.squeeze(nodes @ node_weights, -1)              # (B, N)
        weighted_inc_t = inc.T[None] * w_node[:, None, :]           # (B, E, N)
        edge_adj = jnp.einsum("ben,nk->bek", weighted_inc_t, inc) * edge_lap[None]
        edge_out = jnp.einsum("bek,bkf->bef", edge_adj, edges) @ edge_kernel

        if self.use_bias:
            node_out = node_out + self.param(
                "node_bias", nn.initializers.zeros, (self.node_channels,)
            ).astype(self.dtype)
            edge_out = edge_out + self.param(
                "edge_bias", nn.initializers.zeros, (self.edge_channels,)
            ).astype(self.dtype)

        return nn.relu(node_out), nn.relu(edge_out)
