"""streamtasks_spark.llmdata"""
