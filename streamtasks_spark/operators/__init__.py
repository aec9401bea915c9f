"""streamtasks_spark.operators"""
