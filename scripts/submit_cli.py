"""spark-submit entry: the package arrives via --py-files, so this
launcher only needs the absolute import.

    spark-submit --master ... --py-files dist/geodiff_spark.zip \
        scripts/submit_cli.py diff BASE MOD OUT --summary
"""

from geodiff_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
