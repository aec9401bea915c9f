"""streamtasks_spark.plans"""
