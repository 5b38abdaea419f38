"""KG materialization: triples -> canonical nodes / edges tables.

Completes the north-rule pipeline after triple extraction:

  triples -> entity linking (broadcast dictionary join)
          -> canonicalization (minhash LSH + trigram verify + connected
             components) merging near-duplicate surface entities
          -> nodes (canonical id, name, type, mention stats)
          -> edges (src, pred, dst, weight, prob aggregates, source urls)

Written back as parquet here (Iceberg in production — identical DataFrame
code path; the sandbox has no Iceberg jars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize as CANON
from ..operators import linking as LINK


def build_graph(
    triples: DataFrame,
    spark: SparkSession,
    jaccard_threshold: float = 0.6,
) -> tuple[DataFrame, DataFrame]:
    """Returns (nodes, edges)."""
    if "subj_type" not in triples.columns:
        triples = triples.withColumn(
            "subj_type", F.lit(None).cast("string")
        ).withColumn("obj_type", F.lit(None).cast("string"))
    dictionary = LINK.entity_dictionary(spark)
    linked = LINK.link_triples(triples, dictionary)

    # raw entity nodes from both endpoints
    ends = linked.select(
        F.col("subj_entity_id").alias("node_id"),
        F.col("subj_canonical").alias("name"),
    ).unionByName(
        linked.select(
            F.col("obj_entity_id").alias("node_id"),
            F.col("obj_canonical").alias("name"),
        )
    )
    raw_nodes = ends.groupBy("node_id").agg(
        F.min("name").alias("name"), F.count(F.lit(1)).alias("mention_count")
    )

    # canonicalization: LSH blocking -> exact verify -> components
    bands = CANON.minhash_band_hashes(
        raw_nodes.select("node_id", LINK.normalize_surface(F.col("name")).alias("name")),
        "name",
    )
    cand = CANON.candidate_pairs(bands)
    verified = CANON.verify_pairs_jaccard(
        cand,
        raw_nodes.select("node_id", LINK.normalize_surface(F.col("name")).alias("name")),
        threshold=jaccard_threshold,
    )
    comps = CANON.connected_components(verified)

    canon_map = raw_nodes.join(comps, "node_id", "left").select(
        "node_id",
        F.coalesce("component", "node_id").alias("canonical_id"),
        "name",
        "mention_count",
    )

    nodes = canon_map.groupBy("canonical_id").agg(
        F.min_by("name", "node_id").alias("name"),
        F.sum("mention_count").alias("mention_count"),
        F.count(F.lit(1)).alias("merged_surface_forms"),
    )

    cmap_s = canon_map.select(
        F.col("node_id").alias("subj_entity_id"),
        F.col("canonical_id").alias("src"),
    )
    cmap_o = canon_map.select(
        F.col("node_id").alias("obj_entity_id"),
        F.col("canonical_id").alias("dst"),
    )
    # canon_map is entity-cardinality (small vs triples) but unbounded at
    # web scale: leave the join strategy to Catalyst/AQE rather than
    # forcing a broadcast
    edges = (
        linked.join(cmap_s, "subj_entity_id")
        .join(cmap_o, "obj_entity_id")
        .groupBy("src", F.col("pred"), "dst")
        .agg(
            F.count(F.lit(1)).alias("weight"),
            F.max("prob").alias("max_prob"),
            F.sort_array(F.collect_set("url")).alias("source_urls"),
        )
    )
    return nodes, edges


def merge_edge_deltas(
    old_edges: DataFrame, delta_edges: DataFrame
) -> DataFrame:
    """Append-only edge maintenance: merge a new batch's edge aggregates
    into an existing edges table — weights add, max_prob maxes, source
    url sets union.  One groupBy over the union; at scale this is the
    cheap between-rebuilds path because it touches only edge aggregates
    (entity-pair cardinality), never the raw triples.

    Precondition: the canonical entity map must be stable between the two
    inputs — true whenever the delta introduces no NEW surface forms that
    canonicalize into existing components (entity ids are deterministic
    ``stable_id``s, so dictionary-linked entities never shift).  When new
    unlinked surfaces arrive, rebuild with :func:`build_graph` over the
    append-only triples table instead (the resumable-materialization
    pattern in plans/lineage.py keeps that table incremental)."""
    return (
        old_edges.unionByName(delta_edges)
        .groupBy("src", "pred", "dst")
        .agg(
            F.sum("weight").alias("weight"),
            F.max("max_prob").alias("max_prob"),
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("source_urls")))
            ).alias("source_urls"),
        )
    )


def degree_distribution(
    pairs: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """In/out degree distribution over the distinct ``(src -> dst)`` edge
    set: rows ``(direction, degree, n_nodes)``.  Works over raw triples
    (subj/obj) or the canonical edges table (src/dst) — the shared core
    of the registered ``kg_degree_distribution`` query AND the
    streaming-refresh path (analytics re-run on the incrementally merged
    graph, tests/test_lineage_streaming_media.py)."""
    edges = pairs.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d")
    ).distinct()
    out_deg = edges.groupBy(F.col("_s").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    in_deg = edges.groupBy(F.col("_d").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        out_deg.select(F.lit("out").alias("direction"), "degree")
        .unionAll(in_deg.select(F.lit("in").alias("direction"), "degree"))
        .groupBy("direction", "degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def graph_cardinality_metrics(edges: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Mergeable cardinality metrics over the edges table via HLL++
    (``approx_count_distinct``): distinct subjects / objects / predicates
    and (src,dst) pair cardinality.  At 10^12 edges an exact
    COUNT(DISTINCT entity) shuffles the whole key space; HLL sketches
    combine map-side into a few KB per partition, which is what a
    per-run metrics row (plans/lineage.py) can afford to compute every
    batch."""
    return edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.approx_count_distinct("src", rsd).alias("approx_subjects"),
        F.approx_count_distinct("dst", rsd).alias("approx_objects"),
        F.approx_count_distinct(
            F.concat_ws("|", "src", "dst"), rsd
        ).alias("approx_pairs"),
        F.approx_count_distinct("pred", rsd).alias("approx_predicates"),
    )


def write_graph(
    nodes: DataFrame, edges: DataFrame, base_path: str
) -> None:
    from ..sources.tables import write_table

    write_table(nodes, f"{base_path}/nodes")
    write_table(edges, f"{base_path}/edges")
