from lucenenet_spark.plans.gate import GATE_QUERIES

__all__ = ["GATE_QUERIES"]
