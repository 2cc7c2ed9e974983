"""Ray Data pipeline stages: parse (stateless tasks), enrich (actor pool),
route/fan-out sink writer (stateless tasks with idempotent manifest commit)."""
