"""Entity linking, canonicalization, and graph materialization tests."""

import pyspark.sql.functions as F

from relation_extraction_transformer_spark.operators import canonicalize as CANON
from relation_extraction_transformer_spark.operators import linking as LINK
from relation_extraction_transformer_spark.plans import graph as GRAPH
from relation_extraction_transformer_spark.plans import pipeline as PL
from relation_extraction_transformer_spark.sources import pages as PG


def test_connected_components_known_graph(spark):
    # two components: {1,2,3,4} via chain, {10, 11}; 20 isolated via self-edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)], "src: long, dst: long"
    )
    got = {
        (r.node_id, r.component)
        for r in CANON.connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20)}


def test_connected_components_long_chain(spark):
    # a 40-node path exercises label shortcutting (log-round convergence)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src: long, dst: long"
    )
    comps = CANON.connected_components(edges)
    assert comps.select("component").distinct().count() == 1
    assert comps.agg(F.min("component")).first()[0] == 0


def test_linking_best_candidate(spark):
    dictionary = LINK.entity_dictionary(spark)
    df = spark.createDataFrame(
        [
            ("Alice Turner", "PERSON"),   # exact canonical
            ("turner", "PERSON"),         # family-name alias, ambiguous ->
                                          # lowest entity_id wins
            ("Acme Corp", "ORGANIZATION"),
            ("Unknownia", "CITY"),        # unlinkable
        ],
        "subj: string, subj_type: string",
    ).withColumn("obj", F.lit("x")).withColumn("obj_type", F.lit("CITY"))
    linked = LINK.link_triples(df, dictionary).collect()
    by_surface = {r.subj: r for r in linked}
    assert by_surface["Alice Turner"].subj_canonical == "Alice Turner"
    assert by_surface["Acme Corp"].subj_canonical == "Acme Corp"
    # alias rank 1 link still resolves to SOME Turner person
    assert by_surface["turner"].subj_canonical.endswith("Turner")
    # unlinkable keeps surface and synthesizes a stable id
    assert by_surface["Unknownia"].subj_canonical == "Unknownia"
    assert by_surface["Unknownia"].subj_entity_id is not None
    # determinism of ambiguous links
    linked2 = {r.subj: r.subj_entity_id for r in LINK.link_triples(df, dictionary).collect()}
    assert linked2 == {r.subj: r.subj_entity_id for r in linked}


def test_link_surface_pre_aggregated_dictionary_matches_inline(spark):
    """Round 5: aggregate_dictionary + pre_aggregated=True (the
    materialized-dictionary path that makes the sort-merge join AQE
    skew-splittable, bench.py skew_join section) must link identically
    to the inline form, broadcast and sort-merge alike."""
    dictionary = LINK.entity_dictionary(spark)
    agg = LINK.aggregate_dictionary(dictionary)
    df = spark.createDataFrame(
        [("Alice Turner", "PERSON"), ("turner", "PERSON"),
         ("Acme Corp", "ORGANIZATION"), ("Unknownia", "CITY")],
        "surface: string, ner_type: string",
    )

    def rows(d, pre, bc):
        return sorted(
            tuple(r)
            for r in LINK.link_surface(
                df, d, "surface", "ner_type", "ent",
                broadcast_dict=bc, pre_aggregated=pre,
            ).collect()
        )

    want = rows(dictionary, False, True)
    assert rows(agg, True, True) == want
    assert rows(agg, True, False) == want
    assert rows(dictionary, False, False) == want


def test_minhash_blocking_finds_near_duplicates(spark):
    names = spark.createDataFrame(
        [
            (1, "alice turner"),
            (2, "alice turner"),      # exact dup
            (3, "alicia turner"),     # near dup
            (4, "globex inc"),
        ],
        "node_id: long, name: string",
    )
    bands = CANON.minhash_band_hashes(names, "name")
    pairs = CANON.candidate_pairs(bands)
    verified = {
        (r.src, r.dst)
        for r in CANON.verify_pairs_jaccard(pairs, names, 0.5).collect()
    }
    assert (1, 2) in verified
    assert all(4 not in p for p in verified)


def test_build_graph_end_to_end(spark):
    pages = PG.synthetic_pages(spark, 40, seed=11, partitions=4)
    triples = PL.triples_plan(pages, spark, keep_probs=False)
    nodes, edges = GRAPH.build_graph(triples, spark)
    n_nodes = nodes.count()
    n_edges = edges.count()
    assert n_nodes > 5 and n_edges > 5
    # every edge endpoint resolves to a node
    node_ids = {r.canonical_id for r in nodes.collect()}
    for r in edges.select("src", "dst").collect():
        assert r.src in node_ids and r.dst in node_ids
    # weights aggregate multiple evidence rows
    assert edges.agg(F.max("weight")).first()[0] >= 1


def test_linking_dictionary_reduction_preserves_argmin(spark):
    """The per-(alias, rank, type) min-entity reduction must not change
    any link: verify against a brute-force pandas argmin over the FULL
    unreduced dictionary."""
    import pandas as pd

    dictionary = LINK.entity_dictionary(spark)
    full = dictionary.toPandas()
    df = spark.createDataFrame(
        [(s, t) for s in ("Alice Turner", "turner", "Acme Corp", "Paris",
                          "hassan", "1990", "Nobody Here")
         for t in ("PERSON", "ORGANIZATION", "CITY", "DATE")],
        "subj: string, subj_type: string",
    ).withColumn("obj", F.lit("x")).withColumn("obj_type", F.lit("CITY"))
    linked = {(r.subj, r.subj_type): (r.subj_entity_id, r.subj_canonical)
              for r in LINK.link_triples(df, dictionary).collect()}

    for (surface, typ), (got_id, got_canon) in linked.items():
        norm = " ".join(surface.strip().lower().split())
        cands = full[full.alias_norm == norm]
        if len(cands) == 0:
            assert got_canon == surface
            continue
        best = min(
            cands.itertuples(),
            key=lambda c: (c.alias_rank, 0 if c.ner_type == typ else 1,
                           c.entity_id),
        )
        assert got_id == best.entity_id, (surface, typ)
        assert got_canon == best.canonical_name, (surface, typ)


def test_linking_sort_merge_path_matches_broadcast(spark):
    """Round-2 verdict item 6: the big-dictionary path.  With the
    broadcast hint off and auto-broadcast disabled, the SAME linking plan
    must run as a shuffle join (SortMergeJoin/ShuffledHashJoin, AQE
    skew-join eligible) and produce row-identical results to the
    broadcast path."""
    import pyspark.sql.functions as F

    triples = spark.read.parquet("/root/repo/artifacts/kg_triples.parquet")
    dictionary = LINK.entity_dictionary(spark)

    cols = ["subj", "obj", "subj_entity_id", "obj_entity_id",
            "subj_canonical", "obj_canonical"]
    want = sorted(
        map(tuple, LINK.link_triples(triples, dictionary)
            .select(cols).collect())
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        linked = LINK.link_triples(
            triples, dictionary, broadcast_dict=False
        )
        plan = linked._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        got = sorted(map(tuple, linked.select(cols).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == want


def test_merge_edge_deltas(spark):
    """Append-only edge maintenance: weights add, max_prob maxes, url
    sets union, new edges pass through — one shuffle total."""
    from relation_extraction_transformer_spark.plans import graph as GR

    schema = ("src long, pred string, dst long, weight long, "
              "max_prob double, source_urls array<string>")
    old = spark.createDataFrame(
        [(1, "works_at", 2, 3, 0.9, ["u1", "u2"]),
         (1, "born_in", 3, 1, 0.5, ["u3"])], schema)
    delta = spark.createDataFrame(
        [(1, "works_at", 2, 2, 0.95, ["u2", "u4"]),
         (4, "works_at", 2, 1, 0.7, ["u5"])], schema)
    merged = GR.merge_edge_deltas(old, delta)
    got = {(r.src, r.pred, r.dst): (r.weight, r.max_prob, r.source_urls)
           for r in merged.collect()}
    assert got == {
        (1, "works_at", 2): (5, 0.95, ["u1", "u2", "u4"]),
        (1, "born_in", 3): (1, 0.5, ["u3"]),
        (4, "works_at", 2): (1, 0.7, ["u5"]),
    }
    # union + one aggregation, never a join (AQE repeats the Exchange
    # node inside finalized query stages, so count joins, not exchanges)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Union" in plan


def test_merge_edge_deltas_identity_on_rebuilt_halves(spark):
    """On a corpus whose canonical map is stable across the split (every
    entity dictionary-linked or unique), merging per-half edge builds
    equals the full build."""
    import pyspark.sql.functions as F

    from relation_extraction_transformer_spark.plans import graph as GR

    triples = spark.read.parquet(
        "/root/repo/artifacts/kg_triples.parquet"
    )
    full_nodes, full_edges = GR.build_graph(triples, spark)
    full = {(r.src, r.pred, r.dst): (r.weight, r.max_prob,
                                     tuple(r.source_urls))
            for r in full_edges.collect()}

    h1 = triples.filter(F.crc32(F.col("url")) % 2 == 0)
    h2 = triples.filter(F.crc32(F.col("url")) % 2 == 1)
    _, e1 = GR.build_graph(h1, spark)
    _, e2 = GR.build_graph(h2, spark)
    merged_df = GR.merge_edge_deltas(e1, e2)
    merged = {(r.src, r.pred, r.dst): (r.weight, r.max_prob,
                                       tuple(r.source_urls))
              for r in merged_df.collect()}
    # identical keys, and for every key the aggregates agree except where
    # a cross-half near-dup merge moved a canonical id; on this fixture
    # quantify: at least 95% of edges must merge exactly
    same = sum(1 for k, v in merged.items() if full.get(k) == v)
    assert same / max(len(full), 1) >= 0.95, (
        f"{same}/{len(full)} edges identical after delta merge"
    )


def test_graph_cardinality_metrics_close_to_exact(spark):
    """HLL++ sketch metrics within rsd-scaled tolerance of exact
    distincts (and exact n_edges), computed in ONE pass with no
    distinct shuffle."""
    import pyspark.sql.functions as F

    from relation_extraction_transformer_spark.plans import graph as GR

    triples = spark.read.parquet(
        "/root/repo/artifacts/kg_triples.parquet"
    )
    _, edges = GR.build_graph(triples, spark)
    edges = edges.cache()
    m = GR.graph_cardinality_metrics(edges, rsd=0.02).first()
    exact = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("src").alias("s"),
        F.countDistinct("dst").alias("o"),
        F.countDistinct("src", "dst").alias("p"),
        F.countDistinct("pred").alias("r"),
    ).first()
    assert m.n_edges == exact.n
    for approx, truth in ((m.approx_subjects, exact.s),
                          (m.approx_objects, exact.o),
                          (m.approx_pairs, exact.p),
                          (m.approx_predicates, exact.r)):
        assert abs(approx - truth) <= max(2, 0.1 * truth), (approx, truth)
    plan = GR.graph_cardinality_metrics(edges)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "approx_count_distinct" in plan or "HyperLogLog" in plan


def test_triangle_count_matches_bruteforce(spark):
    """kg_triangle_count's degree-oriented compact-forward join vs an
    independent adjacency-set brute force over the frozen triples
    artifact — guards the orientation logic (a shared-bug risk between
    the Spark plan and its DuckDB twin, which use the same algorithm)."""
    import itertools

    import pandas as pd

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    row = KQ.KG_REGISTRY["kg_triangle_count"].spark(spark, "").toPandas().iloc[0]

    tri = pd.read_parquet(KQ.TRIPLES_PARQUET, columns=["subj", "obj"])
    tri = tri[tri.subj != tri.obj]
    edges = {tuple(sorted(p)) for p in zip(tri.subj, tri.obj)}
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = sum(
        1
        for v, nbrs in adj.items()
        for x, y in itertools.combinations(sorted(nbrs), 2)
        if v < x and y in adj[x]  # v smallest name -> count once
    )
    n_wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    assert int(row.n_nodes) == len(adj)
    assert int(row.n_edges) == len(edges)
    assert int(row.n_wedges) == n_wedges
    assert int(row.n_triangles) == n_tri
    assert row.clustering == round(3.0 * n_tri / n_wedges, 6)


def test_kcore_matches_unbounded_python_peel(spark):
    """kg_kcore runs a FIXED number of peel rounds (so its DuckDB twin
    can unroll the identical computation); this gate peels the same
    graph with an unbounded Python while-loop to the true fixpoint and
    asserts identical survivors + degrees — proving both the peeling
    logic and that the fixed round count reaches convergence."""
    import pandas as pd

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    got = (
        KQ.KG_REGISTRY["kg_kcore"].spark(spark, "").toPandas()
        .sort_values("node").reset_index(drop=True)
    )

    tri = pd.read_parquet(KQ.TRIPLES_PARQUET, columns=["subj", "obj"])
    tri = tri[tri.subj != tri.obj]
    edges = {tuple(sorted(p)) for p in zip(tri.subj, tri.obj)}
    while True:
        deg: dict[str, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= KQ._KCORE_K}
        kept = {e for e in edges if e[0] in alive and e[1] in alive}
        if kept == edges:
            break
        edges = kept
    want = pd.DataFrame(
        sorted((n, d) for n, d in deg.items() if d >= KQ._KCORE_K),
        columns=["node", "core_degree"],
    )
    assert got.node.tolist() == want.node.tolist()
    assert got.core_degree.astype(int).tolist() == want.core_degree.tolist()


def test_dup_clusters_matches_independent_union_find(spark):
    """Round 5: the dup_clusters contract query (connected components
    over LSH candidate pairs, lowest-id keeper) must agree with an
    independent driver-side union-find over the same pairs, and be a
    fixpoint (one more propagation round changes nothing)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r.doc_a, r.doc_b)
        for r in entry.queries()["minhash_candidate_pairs"](
            spark, sf
        ).collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in entry.queries()["dup_clusters"](spark, sf).collect()
    }
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(got) == n_docs
    for doc_id, (cluster_id, keep) in got.items():
        want = find(doc_id) if doc_id in parent else doc_id
        assert cluster_id == want, (doc_id, cluster_id, want)
        assert keep == (cluster_id == doc_id)


def test_dup_clusters_oracle_round_scheme_converges_on_long_chains():
    """Review r5: the DuckDB oracle unrolls propagate+shortcut rounds; a
    plain-propagation unroll only covered diameter == rounds.  Simulate
    the exact per-round semantics of the generated SQL on a 50-node path
    (the worst case for min-label spread) and require full convergence
    within _CC_ROUNDS — the shortcut must give super-linear reach."""
    from relation_extraction_transformer_spark.plans.sql_queries import (
        _CC_ROUNDS,
    )

    n = 50
    sym = [(i, i + 1) for i in range(n - 1)] + [
        (i + 1, i) for i in range(n - 1)
    ]
    labels = {i: i for i in range(n)}
    for _ in range(_CC_ROUNDS):
        prop = dict(labels)
        for src, dst in sym:  # neighbor-min propagation (p_k)
            prop[dst] = min(prop[dst], labels[src])
        labels = {  # label shortcut (l_k)
            node: prop.get(comp, comp) for node, comp in prop.items()
        }
    assert set(labels.values()) == {0}, sorted(set(labels.values()))


def test_pagerank_converges_and_plan_stays_bounded(spark):
    """VERDICT r5 #5: n_iters is a parameter and the rank frame is
    localCheckpointed every 5 rounds inside the loop.  (a) successive-
    iterate L1 deltas shrink (the damped power iteration is a
    contraction), (b) plan depth at 12 iterations is no deeper than at
    5 (the pre-r6 plan grew linearly per iteration)."""
    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    def ranks(k):
        df = KQ._kg_pagerank_spark(spark, "", n_iters=k)
        return {r.node: r.pagerank for r in df.collect()}

    r = {k: ranks(k) for k in (1, 2, 4, 5, 9, 10)}

    def l1(a, b):
        return sum(abs(a[n] - b[n]) for n in a)

    d_early, d_mid, d_late = (
        l1(r[1], r[2]), l1(r[4], r[5]), l1(r[9], r[10])
    )
    assert d_early > d_mid > d_late, (d_early, d_mid, d_late)
    assert d_late < 0.15 * d_early, "power iteration is not contracting"

    # default-iteration result unchanged by the parameterization
    default = {
        row.node: row.pagerank
        for row in KQ._kg_pagerank_spark(spark, "").collect()
    }
    assert default == r[KQ._PR_ITERS]

    def plan_lines(k):
        df = KQ._kg_pagerank_spark(spark, "", n_iters=k)
        return len(
            df._jdf.queryExecution().executedPlan().toString().splitlines()
        )

    assert plan_lines(12) <= plan_lines(5), (
        "in-loop localCheckpoint missing: plan grew with n_iters"
    )


# kg_khop / kg_link_prediction brute-force parity ---------------------------


def test_khop_matches_python_bfs(spark):
    """Multi-source BFS distances equal a pure-Python BFS over the same
    frozen triples, seeds picked by the same (outdeg DESC, subj) order."""
    from collections import deque

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    tri = spark.read.parquet(KQ.TRIPLES_PARQUET)
    edges = {(r.subj, r.obj) for r in tri.select("subj", "obj").collect()}
    outdeg = {}
    adj = {}
    for s, o in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
        adj.setdefault(s, []).append(o)
    seeds = sorted(outdeg, key=lambda s: (-outdeg[s], s))[: KQ._KHOP_SEEDS]
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        if dist[n] >= KQ._KHOP_K:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    got = {(r.node, r.dist) for r in KQ._kg_khop_spark(spark, "").collect()}
    assert got == set(dist.items())


def test_link_prediction_matches_python_brute_force(spark):
    """Common-neighbor counts exact, Adamic-Adar within float tolerance,
    vs a pure-Python wedge enumeration on the same frozen triples."""
    import math
    from itertools import combinations

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    tri = spark.read.parquet(KQ.TRIPLES_PARQUET)
    und = {
        (min(r.subj, r.obj), max(r.subj, r.obj))
        for r in tri.select("subj", "obj").collect()
        if r.subj != r.obj
    }
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    for v, ns in nbrs.items():
        for u, w in combinations(sorted(ns), 2):
            cn, aa = want.get((u, w), (0, 0.0))
            want[(u, w)] = (cn + 1, aa + 1.0 / math.log(len(ns)))
    want = {
        p: s
        for p, s in want.items()
        if s[0] >= KQ._LP_MIN_CN and p not in und
    }
    rows = KQ._kg_link_prediction_spark(spark, "").collect()
    got = {(r.u, r.w): (r.cn, r.aa_score) for r in rows}
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0], p
        assert abs(got[p][1] - want[p][1]) < 1e-8, p


def test_link_prediction_hub_cap(spark):
    """max_middle_degree: capped output is the brute force restricted to
    middles of degree <= cap (a subset of uncapped pairs, never larger
    cn), and the degree filter sits BELOW the wedge self-join in the
    optimized plan — hubs are pruned before the Theta(deg^2) blowup."""
    import math
    from itertools import combinations

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    cap = 3
    tri = spark.read.parquet(KQ.TRIPLES_PARQUET)
    und = {
        (min(r.subj, r.obj), max(r.subj, r.obj))
        for r in tri.select("subj", "obj").collect()
        if r.subj != r.obj
    }
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {}
    for v, ns in nbrs.items():
        if len(ns) > cap:  # hub middles contribute no wedges
            continue
        for u, w in combinations(sorted(ns), 2):
            cn, aa = want.get((u, w), (0, 0.0))
            want[(u, w)] = (cn + 1, aa + 1.0 / math.log(len(ns)))
    want = {
        p: s
        for p, s in want.items()
        if s[0] >= KQ._LP_MIN_CN and p not in und
    }
    capped_df = KQ._kg_link_prediction_spark(spark, "", max_middle_degree=cap)
    capped = {
        (r.u, r.w): (r.cn, r.aa_score) for r in capped_df.collect()
    }
    assert set(capped) == set(want)
    for p, (cn, aa) in want.items():
        assert capped[p][0] == cn, p
        assert abs(capped[p][1] - aa) < 1e-8, p
    uncapped = {
        (r.u, r.w): r.cn
        for r in KQ._kg_link_prediction_spark(spark, "").collect()
    }
    assert set(capped) <= set(uncapped)
    for p in capped:
        assert capped[p][0] <= uncapped[p]
    # plan shape: the cap filter prints BELOW (after) the wedge
    # self-join line — i.e. it executes before the join, in its inputs
    plan = (
        KQ._kg_link_prediction_spark(
            spark, "", max_middle_degree=cap, materialize=False
        )
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    lines = plan.splitlines()
    join_idx = [i for i, ln in enumerate(lines) if "Join" in ln]
    filt_idx = [
        i for i, ln in enumerate(lines)
        if "Filter" in ln and f"<= {cap}" in ln
    ]
    assert filt_idx, plan
    assert min(join_idx) < max(filt_idx), plan


def test_wcc_matches_python_union_find(spark):
    """kg_wcc equals a pure-Python union-find with min-id relabeling
    over the same frozen triples."""
    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    tri = spark.read.parquet(KQ.TRIPLES_PARQUET)
    und = {
        (min(r.subj, r.obj), max(r.subj, r.obj))
        for r in tri.select("subj", "obj").collect()
        if r.subj != r.obj
    }
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    want = {
        n: min(members)
        for members in comp.values()
        for n in members
    }
    got = {r.node: r.component for r in KQ._kg_wcc_spark(spark, "").collect()}
    assert got == want


# --- kg_communities: synchronous label propagation --------------------------


def _lpa_python(edges, n_rounds=5):
    """Independent synchronous LPA: neighbor-majority, ties to min label."""
    import collections

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in adj}
    for _ in range(n_rounds):
        new = {}
        for v, nbs in adj.items():
            cnt = collections.Counter(labels[u] for u in nbs)
            best = min(((-c, l) for l, c in cnt.items()))
            new[v] = best[1]
        labels = new
    return labels


def _communities(spark, rows, n_rounds=5):
    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    tri = spark.createDataFrame(
        [(s, "p", o) for s, o in rows], "subj string, pred string, obj string"
    )
    return {
        r.node: r.community
        for r in KQ._kg_communities_spark(
            spark, "", triples=tri, n_rounds=n_rounds
        ).collect()
    }


def test_lpa_splits_planted_clusters_and_matches_independent_impl(spark):
    """Two 5-cliques joined by one bridge edge: LPA must keep them as
    two communities, exactly matching the independent Python LPA."""
    import itertools

    ca = [f"a{i}" for i in range(5)]
    cb = [f"b{i}" for i in range(5)]
    edges = (
        list(itertools.combinations(ca, 2))
        + list(itertools.combinations(cb, 2))
        + [("a0", "b0")]
    )
    got = _communities(spark, edges)
    assert got == _lpa_python(edges)
    assert len({got[v] for v in ca}) == 1
    assert len({got[v] for v in cb}) == 1
    assert got["a1"] != got["b1"], "bridged cliques must stay separate"


def test_lpa_matches_independent_impl_on_artifact_graph(spark):
    """Round-for-round parity with the Python implementation on the
    real frozen entity graph, and partition invariance."""
    from pyspark.sql import functions as F

    from relation_extraction_transformer_spark.plans import kg_sql as KQ

    und = KQ._und_edges(spark)
    edges = [(r.a, r.b) for r in und.collect()]
    want = _lpa_python(edges, n_rounds=3)
    tri = spark.read.parquet(KQ.TRIPLES_PARQUET)
    for parts in (None, 7):
        t = tri if parts is None else tri.repartition(parts)
        got = {
            r.node: r.community
            for r in KQ._kg_communities_spark(
                spark, "", triples=t, n_rounds=3
            ).collect()
        }
        assert got == want
