from .partitioning import repartition_by_length, salt_hot_keys, plan_report

__all__ = ["repartition_by_length", "salt_hot_keys", "plan_report"]
