"""End-to-end logical plans composing the operators (pages -> triples ->
nodes/edges), plus lineage/metrics and checkpoint-resume."""
