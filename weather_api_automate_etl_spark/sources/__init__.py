from weather_api_automate_etl_spark.sources.tables import load_table, register_testdata

__all__ = ["load_table", "register_testdata"]
