from open_thoughts_spark.oracle.pandas_oracle import oracle_decisions

__all__ = ["oracle_decisions"]
