# Container image for the PySpark engine — the deployment analogue of the
# reference's Dockerfile (python:3.11-alpine + solarman.py entrypoint).
# Spark needs a JVM, so the base is a JRE image with Python on top; in a
# cluster deployment this image is the driver/executor container handed to
# spark-submit / the Kubernetes operator with the real master URL.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt /app/requirements.txt
RUN pip3 install --no-cache-dir -r requirements.txt
# Optional codec extras: Pillow enables the REAL image decode/phash paths,
# soundfile (libsndfile) the compressed-audio path, and PyAV (ffmpeg) the
# compressed-video path in operators/multimodal.py (each behind its
# _*_available gate — the engine runs without them using the stdlib WAV
# codec / Y4M demuxer and the documented deterministic stand-ins, but CI
# built from this image executes the real-media tests instead of
# skipping them).
RUN pip3 install --no-cache-dir "pillow>=10" soundfile av

COPY solis_solarman_clickhouse_spark /app/solis_solarman_clickhouse_spark
COPY __spark_entry__.py bench.py /app/

ENV PYTHONUNBUFFERED=1 \
    SPARK_GRAFT_CPUS=4

# Default: run the streaming ingest pipeline (fixture replay → idempotent
# sink); override CMD for bench or ad-hoc queries.
ENTRYPOINT ["python3", "-u"]
CMD ["-m", "solis_solarman_clickhouse_spark.ingest"]
