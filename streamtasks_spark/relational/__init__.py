"""streamtasks_spark.relational"""
