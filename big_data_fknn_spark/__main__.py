from big_data_fknn_spark.cli import main

main()
