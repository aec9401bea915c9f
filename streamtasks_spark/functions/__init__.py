"""streamtasks_spark.functions"""
