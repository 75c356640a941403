import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from search_engine_ray import datagen

    return datagen.transcripts_files("sf0.001")


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    """One full index build shared by the whole session."""
    from search_engine_ray.config import BuildConfig
    from search_engine_ray.pipelines import build

    out = str(tmp_path_factory.mktemp("idx"))
    cfg = BuildConfig(
        input_paths=tiny_corpus, out_dir=out, n_partitions=3, concurrency=2
    )
    manifest = build.build_index(cfg)
    return {"out_dir": out, "manifest": manifest, "files": tiny_corpus}


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
