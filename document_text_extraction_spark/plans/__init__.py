from .explain import assert_pushdown, plan_report, plan_string  # noqa: F401
