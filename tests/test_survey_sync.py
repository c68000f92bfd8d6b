"""SURVEY.md §2 <-> registry sync guard (round-6 verdict directive #6).

The coverage contract is that SURVEY.md names every registered query
and registers every named one; the only allowed asymmetry is
`q_sample`, which §2.B itself excludes as cross-engine-nondeterministic
(replaced by `q_sample_mod`). This drifted by a few ids at the end of
rounds 4 and 5 — pin it so it cannot drift silently again.
"""

from __future__ import annotations

import re
from pathlib import Path

SURVEY = Path(__file__).resolve().parents[1] / "SURVEY.md"


def test_survey_ids_match_registry():
    from direct_kafka_stream_spark.registry import QUERIES

    survey_ids = set(re.findall(r"`(q_[a-z0-9_]+)`", SURVEY.read_text()))
    registry_ids = set(QUERIES)
    missing_from_survey = registry_ids - survey_ids
    unregistered = survey_ids - registry_ids
    assert not missing_from_survey, (
        f"registered but not named in SURVEY.md: {sorted(missing_from_survey)}"
    )
    assert unregistered == {"q_sample"}, (
        "SURVEY.md names ids outside the registry beyond the documented "
        f"q_sample exclusion: {sorted(unregistered - {'q_sample'})}"
    )
