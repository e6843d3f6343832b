"""Plans: orchestration (runner), checkpoint/resume, reports — the
Spark-native restatement of the reference's Manager + eHive pipeline
(SURVEY.md §2.5, §3.2)."""
