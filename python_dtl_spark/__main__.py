from python_dtl_spark.main import main

main()
