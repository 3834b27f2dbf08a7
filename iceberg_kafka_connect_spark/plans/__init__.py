from .inspect import plan_string, count_in_plan, assert_plan

__all__ = ["plan_string", "count_in_plan", "assert_plan"]
