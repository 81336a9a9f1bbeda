"""Semantic invariants for the iterative PageRank operator (its exactness
vs DuckDB is covered by the differential oracle test)."""

from __future__ import annotations

from mapreduce_infrastructure_spark.operators.graph import (
    _SUPP_OFFSET,
    pagerank_trade_graph,
)


def test_pagerank_invariants(spark, sf_dir):
    rows = pagerank_trade_graph(spark, sf_dir).collect()
    assert rows
    by_type = {"customer": [], "supplier": []}
    for r in rows:
        assert r["rank"] >= 0.15  # damping floor
        assert (r["node"] >= _SUPP_OFFSET) == (r["node_type"] == "supplier")
        by_type[r["node_type"]].append(r["rank"])
    assert by_type["customer"] and by_type["supplier"]
    # suppliers are far fewer than customers but receive edges from many
    # customers: their mean rank must exceed the customer mean
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(by_type["supplier"]) > mean(by_type["customer"])
    # total rank stays near N (damped leakage only): loose sanity bound
    total = sum(r["rank"] for r in rows)
    assert 0.5 * len(rows) <= total <= 1.5 * len(rows)


def test_pagerank_deterministic_rerun(spark, sf_dir):
    a = {(r["node"], r["rank"]) for r in pagerank_trade_graph(spark, sf_dir).collect()}
    b = {(r["node"], r["rank"]) for r in pagerank_trade_graph(spark, sf_dir).collect()}
    assert a == b


def test_khop_reachability_bfs_invariants(spark, sf_dir):
    """BFS contract on the bipartite trade graph: hop 0 = exactly the
    in-graph nation-0 customer seeds, parity alternates node_type
    (odd hops = suppliers, even = customers), each hop-k node has a
    hop-(k-1) neighbor, and a Python BFS over the collected edge list
    reproduces every distance exactly."""
    from collections import deque

    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.graph import (
        _build_graph,
        khop_reachability_trade,
    )

    out = {r.node: (r.node_type, r.hops) for r in
           khop_reachability_trade(spark, sf_dir).collect()}
    assert out
    for node, (ntype, hops) in out.items():
        assert 0 <= hops <= 3
        assert ntype == ("supplier" if hops % 2 == 1 else "customer")

    edges_df, _, _ = _build_graph(spark, sf_dir)
    adj = {}
    for r in edges_df.collect():
        adj.setdefault(r.src, []).append(r.dst)
    cust = load_table(spark, sf_dir, "customer")
    seeds = {
        r.node
        for r in cust.filter(F.col("c_nationkey") == 0)
        .select(F.col("c_custkey").alias("node"))
        .collect()
        if r.node in adj
    }
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= 3:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert {n: h for n, (_, h) in out.items()} == dist


def test_cheapest_path_3hop_dijkstra_reference(spark, sf_dir):
    """Bellman-Ford K=3 result equals a Python hop-bounded DP over the
    collected weighted edge list, and every reached node's cost is
    attainable by some explicit <=3-edge path from a seed."""
    from pyspark.sql import functions as F

    from mapreduce_infrastructure_spark.catalog import load_table
    from mapreduce_infrastructure_spark.operators.graph import (
        _build_weighted_graph,
        cheapest_path_3hop_trade,
    )

    out = {r.node: r.min_cost for r in
           cheapest_path_3hop_trade(spark, sf_dir).collect()}
    assert out
    edges = [(r.src, r.dst, r.w) for r in
             _build_weighted_graph(spark, sf_dir).collect()]
    cust = load_table(spark, sf_dir, "customer")
    in_graph = {s for s, _, _ in edges}
    seeds = {
        r.c_custkey
        for r in cust.filter(F.col("c_nationkey") == 0)
        .select("c_custkey")
        .collect()
        if r.c_custkey in in_graph
    }
    dist = {s: 0 for s in seeds}
    for _ in range(3):
        nxt = dict(dist)
        for u, v, w in edges:
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    assert out == dist
    # seeds cost 0; every non-seed cost is positive (prices > 0)
    for n, c in out.items():
        assert (c == 0) == (n in seeds)


def test_weighted_ppr_invariants(spark, sf_dir):
    """Weighted PPR: non-negative ranks, only ≤5-hop-reachable nodes (or
    seeds) carry mass, the weighting genuinely changes the ordering vs
    the unweighted PPR (else the w/W(u) term is dead code), and a rerun
    is bit-identical."""
    from mapreduce_infrastructure_spark.operators.graph import (
        pagerank_personalized,
        pagerank_weighted_personalized,
    )

    w1 = {r.node: r["rank"] for r in
          pagerank_weighted_personalized(spark, sf_dir).collect()}
    assert w1
    assert all(v >= 0.0 for v in w1.values())
    u = {r.node: r["rank"] for r in
         pagerank_personalized(spark, sf_dir).collect()}
    assert set(w1) == set(u)  # same node universe
    # mass supported on the same reachable set: zero iff zero
    zeros_w = {n for n, v in w1.items() if v == 0.0}
    zeros_u = {n for n, v in u.items() if v == 0.0}
    assert zeros_w == zeros_u
    # the weights must matter for at least some nodes
    assert any(abs(w1[n] - u[n]) > 1e-6 for n in w1)
    w2 = {r.node: r["rank"] for r in
          pagerank_weighted_personalized(spark, sf_dir).collect()}
    assert w1 == w2


def test_weighted_khop_cheapest_compare_composition(spark, sf_dir):
    """The compare join must keep EVERY node of both parents (identical
    reachable sets by construction), reproduce the parents' columns
    verbatim, and compute cost_per_hop as exact integer division — NULL
    exactly on the hop-0 seed cohort."""
    from mapreduce_infrastructure_spark.operators.graph import (
        cheapest_path_3hop_trade,
        khop_reachability_trade,
        weighted_khop_cheapest_compare,
    )

    out = {r.node: r for r in weighted_khop_cheapest_compare(spark, sf_dir).collect()}
    bfs = {r.node: r for r in khop_reachability_trade(spark, sf_dir).collect()}
    cheap = {r.node: r for r in cheapest_path_3hop_trade(spark, sf_dir).collect()}
    # identical reachable sets, no dropped/invented nodes
    assert set(out) == set(bfs) == set(cheap)
    for n, r in out.items():
        assert r.hops == bfs[n].hops
        assert r.min_cost == cheap[n].min_cost
        assert r.node_type == bfs[n].node_type
        if r.hops == 0:
            assert r.cost_per_hop is None and r.min_cost == 0
        else:
            assert r.cost_per_hop == r.min_cost // r.hops


def test_degree_assortativity_scalar_reference(spark, sf_dir):
    """Exact-integer Python recount of Newman's r over the collected edge
    list: same stub sums, same single IEEE division — the engine value
    must match bit-for-bit. Plus the structural expectations: bipartite
    trade graphs are disassortative (r < 0) on any non-regular fixture,
    and n_edges is the symmetric (doubled) count."""
    from mapreduce_infrastructure_spark.operators.graph import (
        _build_graph,
        trade_graph_degree_assortativity,
    )

    row = trade_graph_degree_assortativity(spark, sf_dir).collect()[0]
    edges, _n, _d = _build_graph(spark, sf_dir)
    es = [(r.src, r.dst) for r in edges.collect()]
    deg = {}
    for u, _v in es:
        deg[u] = deg.get(u, 0) + 1
    n = len(es)
    sx = sum(deg[u] for u, _ in es)
    sxy = sum(deg[u] * deg[v] for u, v in es)
    sxx = sum(deg[u] * deg[u] for u, _ in es)
    assert row.n_edges == n and row.n_nodes == len(deg)
    num, den = n * sxy - sx * sx, n * sxx - sx * sx
    if den == 0:
        assert row.assortativity is None
    else:
        assert row.assortativity == float(num) / float(den)
        assert row.assortativity < 0  # bipartite hub-spoke structure
    assert n % 2 == 0  # symmetric edge list


def test_strength_assortativity_scalar_reference(spark, sf_dir):
    """Exact-integer Python recount of the weighted (strength)
    assortativity over the collected weighted part edges: same stub
    sums, same single IEEE division — the engine value must match
    bit-for-bit; w_total/n_edges/n_nodes recounted too."""
    from mapreduce_infrastructure_spark.operators.graph import (
        _part_cooccur_edges_weighted,
        parts_graph_strength_assortativity,
    )

    row = parts_graph_strength_assortativity(spark, sf_dir).collect()[0]
    es = [
        (r.x, r.y, r.w)
        for r in _part_cooccur_edges_weighted(spark, sf_dir).collect()
    ]
    s: dict = {}
    for x, y, w in es:
        s[x] = s.get(x, 0) + w
        s[y] = s.get(y, 0) + w
    stubs = [(x, y, w) for x, y, w in es] + [(y, x, w) for x, y, w in es]
    tw = sum(w for _, _, w in stubs)
    sx1 = sum(w * s[u] for u, _, w in stubs)
    sxy = sum(w * s[u] * s[v] for u, v, w in stubs)
    sxx = sum(w * s[u] * s[u] for u, _, w in stubs)
    assert row.n_edges == len(es)
    assert row.n_nodes == len(s)
    assert row.w_total == sum(w for _, _, w in es)
    num, den = tw * sxy - sx1 * sx1, tw * sxx - sx1 * sx1
    if den == 0:
        assert row.strength_assortativity is None
    else:
        assert row.strength_assortativity == float(num) / float(den)


def test_parts_clustering_by_degree_scalar_reference(spark, sf_dir):
    """Python recount of the clustering-by-degree curve from the raw
    fixture: rebuild the co-occurrence edge set, per-node degrees and
    triangle counts, then check every degree class's (n_nodes,
    tri_slots) and the one-division mean 2*sum_t/(d*(d-1)*n). Also pins
    consistency with triangle_counts_parts (same per-node counts)."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_clustering_by_degree,
        triangle_counts_parts,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    edges = {p for p, n in pair_counts.items() if n >= TRI_MIN_SHARED}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            for n in (a, b, c):
                tri[n] = tri.get(n, 0) + 1
    for n in tri:
        tri[n] //= 3  # each triangle visited via its 3 edges
    got_tri = {
        r.node: r.n_triangles
        for r in triangle_counts_parts(spark, sf_dir).collect()
    }
    assert got_tri == {n: t for n, t in tri.items() if t}
    want = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        cnt, tot = want.get(d, (0, 0))
        want[d] = (cnt + 1, tot + tri.get(n, 0))
    got = {
        r.degree: r for r in parts_clustering_by_degree(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d, (n_nodes, tot) in want.items():
        row = got[d]
        assert (row.n_nodes, row.tri_slots) == (n_nodes, tot)
        assert row.mean_clustering == (2 * tot) / (d * (d - 1) * n_nodes)
        assert 0.0 <= row.mean_clustering <= 1.0


def test_parts_degree_distribution_scalar_reference(spark, sf_dir):
    """Python recount of the degree histogram plus the handshake lemma:
    Σ degree·n_nodes = 2·|edges|, node shares sum to 1 (exact rational
    check via counts), and edge_end_share is the stated one division."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_graph_degree_distribution,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    edges = {p for p, n in pair_counts.items() if n >= TRI_MIN_SHARED}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    hist = {}
    for d in deg.values():
        hist[d] = hist.get(d, 0) + 1
    got = {
        r.degree: r
        for r in parts_graph_degree_distribution(spark, sf_dir).collect()
    }
    assert set(got) == set(hist)
    total = sum(hist.values())
    ends = sum(d * n for d, n in hist.items())
    assert ends == 2 * len(edges)  # handshake lemma
    for d, n in hist.items():
        row = got[d]
        assert row.n_nodes == n
        assert row.node_share == n / total
        assert row.edge_end_share == (d * n) / ends


def test_parts_component_sizes_scalar_reference(spark, sf_dir):
    """Python recount of the component-size distribution: same edge set
    (pairs sharing >= TRI_MIN_SHARED orders), union-find components,
    exact size histogram, one-division node shares (1e-6 floor-rounded
    like the engine/oracle). Plus the mass law: sizes x counts sum to
    the node total, and every component size >= 2 (nodes are edge
    endpoints by construction)."""
    import math
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_graph_component_sizes,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    edges = [p for p, c in pair_counts.items() if c >= TRI_MIN_SHARED]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes = {}
    for node in parent:
        r = find(node)
        sizes[r] = sizes.get(r, 0) + 1
    hist = {}
    for s in sizes.values():
        hist[s] = hist.get(s, 0) + 1
    total = sum(s * n for s, n in hist.items())
    got = {
        r.component_size: r
        for r in parts_graph_component_sizes(spark, sf_dir).collect()
    }
    assert set(got) == set(hist)
    for s, n in hist.items():
        row = got[s]
        assert s >= 2
        assert row.n_components == n
        assert row.n_nodes == s * n
        assert row.share_of_nodes == (
            math.floor((s * n) / total * 1000000 + 0.5) / 1000000
        )
    assert sum(r.n_nodes for r in got.values()) == total == len(parent)


def test_parts_triangle_participation_scalar_reference(spark, sf_dir):
    """Python recount of the participation rate: same edge set, brute
    triangle enumeration, per-degree participation counts and one
    IEEE division. Plus the consistency laws: degree-1 classes have
    participation 0, and n_in_triangle <= n_nodes everywhere."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_triangle_participation_by_degree,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    edges = [p for p, c in pair_counts.items() if c >= TRI_MIN_SHARED]
    adj = {}
    deg = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    in_tri = set()
    eset = set(edges)
    for a, b in edges:
        if (adj[a] & adj[b]):
            in_tri.add(a)
            in_tri.add(b)
            in_tri |= adj[a] & adj[b] & {c for c in adj[a] if c in adj[b]}
    # recompute strictly: a node participates iff two of its neighbors
    # are adjacent
    in_tri = {
        u
        for u, ns in adj.items()
        if any(
            (min(v, w), max(v, w)) in eset for v, w in combinations(ns, 2)
        )
    }
    want = {}
    for u, d in deg.items():
        n, t = want.get(d, (0, 0))
        want[d] = (n + 1, t + (1 if u in in_tri else 0))
    got = {
        r.degree: r
        for r in parts_triangle_participation_by_degree(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d, (n, t) in want.items():
        row = got[d]
        assert row.n_nodes == n
        assert row.n_in_triangle == t
        assert row.participation_share == t / n
        assert row.n_in_triangle <= row.n_nodes
        if d == 1:
            assert row.n_in_triangle == 0


def test_parts_edge_weight_histogram_scalar_reference(spark, sf_dir):
    """Python recount of the edge-weight histogram: same pair counts and
    TRI_MIN_SHARED floor, same one-division shares, mass identity
    Σ weight·n_edges = total co-occurrence mass, cumulative ends at 1."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_graph_edge_weight_histogram,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    weights = [n for n in pair_counts.values() if n >= TRI_MIN_SHARED]
    hist = {}
    for w in weights:
        hist[w] = hist.get(w, 0) + 1
    got = {
        r.weight: r
        for r in parts_graph_edge_weight_histogram(spark, sf_dir).collect()
    }
    assert set(got) == set(hist)
    total_edges = len(weights)
    total_mass = sum(weights)
    cum = 0
    for w in sorted(hist):
        n = hist[w]
        cum += n
        row = got[w]
        assert row.n_edges == n
        assert row.edge_share == n / total_edges
        assert row.weight_share == (w * n) / total_mass
        assert row.cum_edge_share == cum / total_edges
    assert got[max(hist)].cum_edge_share == 1.0


def test_parts_weighted_degree_distribution_scalar_reference(spark, sf_dir):
    """Python recount of the STRENGTH histogram: per-node incident-weight
    sums over the same pair counts and TRI_MIN_SHARED floor, same
    one-division shares, weighted handshake identity
    Σ strength·n_nodes = 2·Σ edge weight, node total matches the
    (unweighted) degree distribution's."""
    from itertools import combinations

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_graph_degree_distribution,
        parts_graph_weighted_degree_distribution,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pydict()
    by_order = {}
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order.setdefault(o, set()).add(p)
    pair_counts = {}
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    strength = {}
    total_w = 0
    for (a, b), w in pair_counts.items():
        if w < TRI_MIN_SHARED:
            continue
        total_w += w
        strength[a] = strength.get(a, 0) + w
        strength[b] = strength.get(b, 0) + w
    hist = {}
    for s in strength.values():
        hist[s] = hist.get(s, 0) + 1
    got = {
        r.strength: r
        for r in parts_graph_weighted_degree_distribution(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(hist)
    n_nodes = len(strength)
    mass = sum(strength.values())
    assert mass == 2 * total_w  # weighted handshake lemma
    for s, n in hist.items():
        row = got[s]
        assert row.n_nodes == n
        assert row.node_share == n / n_nodes
        assert row.strength_mass_share == (s * n) / mass
    # node population identical to the unweighted degree histogram's
    deg_total = sum(
        r.n_nodes
        for r in parts_graph_degree_distribution(spark, sf_dir).collect()
    )
    assert deg_total == n_nodes


def test_parts_graph_strength_vs_degree_matrix_scalar_reference(spark, sf_dir):
    """Python recount of the degree x strength quintile matrix over the
    w>=TRI_MIN_SHARED co-occurrence edges: same per-node degree/strength
    folds, same max(1, ceil(k/5*n)) thresholds and strict-greater
    ladder; row shares partition each degree row."""
    import math

    import pyarrow.parquet as pq

    from mapreduce_infrastructure_spark.operators.graph import (
        TRI_MIN_SHARED,
        parts_graph_strength_vs_degree_matrix,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    by_order: dict = {}
    for ok, pk in zip(
        li["l_orderkey"].to_pylist(), li["l_partkey"].to_pylist()
    ):
        by_order.setdefault(ok, set()).add(pk)
    w: dict = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                w[(ps[i], ps[j])] = w.get((ps[i], ps[j]), 0) + 1
    deg: dict = {}
    st: dict = {}
    for (a, b), ww in w.items():
        if ww < TRI_MIN_SHARED:
            continue
        for node in (a, b):
            deg[node] = deg.get(node, 0) + 1
            st[node] = st.get(node, 0) + ww
    nodes = sorted(deg)
    n = len(nodes)

    def thresholds(vals: "list[int]") -> "list[int]":
        s = sorted(vals)
        return [s[max(1, math.ceil(k / 5.0 * n)) - 1] for k in (1, 2, 3, 4)]

    td = thresholds([deg[x] for x in nodes])
    ts = thresholds([st[x] for x in nodes])
    cells: dict = {}
    for x in nodes:
        dq = 1 + sum(1 for t in td if deg[x] > t)
        sq = 1 + sum(1 for t in ts if st[x] > t)
        cells[(dq, sq)] = cells.get((dq, sq), 0) + 1
    row_tot: dict = {}
    for (dq, _sq), c in cells.items():
        row_tot[dq] = row_tot.get(dq, 0) + c
    got = {
        (r.degree_quintile, r.strength_quintile): r
        for r in parts_graph_strength_vs_degree_matrix(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for key, c in cells.items():
        r = got[key]
        assert r.n_parts == c
        assert r.n_row == row_tot[key[0]]
        assert r.row_share == c / row_tot[key[0]]
    assert sum(cells.values()) == n
