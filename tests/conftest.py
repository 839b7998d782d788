import pytest


@pytest.fixture(scope="session")
def spark():
    from effocr_spark.session import get_spark

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def protos_bc(spark):
    from effocr_spark.pipeline import broadcast_prototypes

    return broadcast_prototypes(spark)


@pytest.fixture(scope="session")
def prototypes():
    from effocr_spark.functions.recognize import build_prototypes

    return {"en": build_prototypes("en"), "jp": build_prototypes("jp")}
