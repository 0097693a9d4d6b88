"""Structured Streaming analytics over the events table.

The reference has no streaming surface (SURVEY.md §2.9); these are the
streaming twins of the batch sessionization/window operators in
``operators.sessionize`` — same expressions, ``readStream`` source,
watermarked state. See :mod:`.events`.
"""

from . import events, stateful  # noqa: F401

# Ingest-time twins (imported lazily by their tests, listed here for
# discoverability): .neardup (streaming near-dup drop), .novelty
# (first-seen window credit), .upsert (CDC apply with versioned
# snapshots — the streaming form of operators/layout.py x116),
# .worklist (affected-partition ledger maintenance — the streaming
# form of x124, closing the detect/apply/scope incremental triad).
