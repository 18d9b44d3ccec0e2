"""Bench/metrics harness (SURVEY.md §7 layer 4): latency metrics with the
reference's exact conventions, report/JSON/Prometheus-text emitters."""
