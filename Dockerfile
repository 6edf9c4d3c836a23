# Container packaging for the graft retention job — the reference's
# Dockerfile.multistage:1-25 shape (build stage producing the jar, slim
# run stage carrying only jar + runtime) on PUBLIC base images instead
# of its private ECR builders.
#
# Build:  docker build --build-arg APP_VERSION=0.1.0 -t graft:local .
# Run:    see k8s/pod.yaml (cluster) or tools/container_smoke.sh (local)
#
# The library is a THIN jar: only Spark + JDK at runtime, so the
# apache/spark image's own distribution supplies every dependency —
# no assembly/shading stage needed (the reference fat-jar'd because it
# bundled the ES connector; the connector binding here is a deploy-time
# classpath addition, README "Migrating from ... Elasticsearch").

# ---- build stage ----------------------------------------------------
FROM sbtscala/scala-sbt:eclipse-temurin-17.0.15_6_1.11.7_2.13.16 AS build
ARG APP_VERSION=0.1.0
WORKDIR /code

# dependency-related files first, for layer caching (reference
# Dockerfile.multistage:7-10)
ADD build.sbt /code/
ADD project/ /code/project/
RUN sbt update

# then the volatile part
ADD src/ /code/src/
RUN sbt "set version := \"$APP_VERSION\"" package

# ---- run stage ------------------------------------------------------
FROM apache/spark:4.0.0-java17
ARG APP_VERSION=0.1.0
WORKDIR /opt/graft

COPY --from=build /code/target/scala-2.13/*-$APP_VERSION.jar /opt/graft/graft.jar
COPY tools/container_entry.sh /opt/graft/container_entry.sh

# the reference job's env-var contract (pod.yaml:14-33), graft names:
# CLIENT_CODE, GRAFT_DATA_DIR, GRAFT_SINK, SPARK_PROCESS_BATCH_SIZE
ENV CLIENT_CODE=ALL \
    GRAFT_DATA_DIR=/data \
    GRAFT_SINK=/sink \
    SPARK_PROCESS_BATCH_SIZE=10000

ENTRYPOINT ["/opt/graft/container_entry.sh"]
