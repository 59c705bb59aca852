"""Pipeline plans: the fused extraction stage, ordering, checkpoint/lineage."""
