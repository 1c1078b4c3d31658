"""Deterministic stub LLM backend (SURVEY.md §5 point 2, FIXTURES.md §5).

Replaces the OpenAI chat-completion classifier so end-to-end pipeline
outputs are byte-stable. Label = hash-bucketed over (entity_id, text);
motivation mentions 'Target Company' in ~75% of rows so the reference's
guardrail (labeling.py:379 — force 'U' unless the motivation cites the
target) is exercised both ways.
"""

from __future__ import annotations

from bigdata_cookbook_spark.sources.fixtures import hash_str

LABELS = ["P", "A", "N", "U"]


def stub_backend(rows: list[dict]) -> list[dict]:
    """rows: [{id, entity_id, text}] -> [{id, label, motivation}]."""
    out = []
    for r in rows:
        h = hash_str(f"{r['entity_id']}|{r['text']}")
        label = LABELS[h % 4]
        mentions_target = (h >> 4) % 4 != 0  # ~75%
        subject = "Target Company" if mentions_target else "the company"
        out.append(
            {
                "id": r["id"],
                "label": label,
                "motivation": f"{subject} stub motivation {label}",
            }
        )
    return out


def make_choice_backend(choices: list[str], salt: str = "") -> "callable":
    """Deterministic labeler over a CALLER-SUPPLIED label set — the stub
    tier for ScreenerLabeler-style taxonomy labeling (leaf labels +
    'Not Applicable') and for tag classifiers (L8 driver tags). Lives in
    the package (not in example scripts) so cloudpickle serializes it by
    reference and executors can import it under any entry point."""
    opts = list(choices)

    def backend(rows: list[dict]) -> list[dict]:
        out = []
        for r in rows:
            h = hash_str(f"{salt}|{r['entity_id']}|{r['text']}")
            pick = opts[h % len(opts)]
            out.append(
                {
                    "id": r["id"],
                    "label": pick,
                    "motivation": f"stub {salt or 'choice'} {h % len(opts)}",
                }
            )
        return out

    return backend
