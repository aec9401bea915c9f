"""streamtasks_spark.streaming"""
