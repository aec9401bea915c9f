"""streamtasks_spark.core"""
