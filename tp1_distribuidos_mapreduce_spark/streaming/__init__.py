"""Structured Streaming surface over the `events` stream-shaped table.

No counterpart in the reference (strictly batch — the job ends when the
coordinator distributes Finish, cmd/coordinator/coordinator.go:142-148);
this is the additive streaming surface mandated by BASELINE.md.
"""
