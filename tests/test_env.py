import jax
def test_platform():
    print("PLATFORM:", jax.devices()[0].platform, len(jax.devices()))
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
