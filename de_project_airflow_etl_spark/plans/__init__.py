"""Physical-plan inspection helpers — how we verify that Catalyst did
what the declarative code intends (pushdown/pruning/broadcast)."""
