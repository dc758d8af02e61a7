"""End-to-end pipeline assembly: staged KG build with a checkpoint
manifest (per-stage lineage + counters) and resume-from-last-committed
semantics."""
