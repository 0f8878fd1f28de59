from sedona_db_spark.plans.demo_queries import QUERIES, ORACLE_SQL  # noqa: F401
