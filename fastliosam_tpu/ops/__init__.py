from .nn_pallas import nearest_neighbors_pallas, pallas_supported  # noqa: F401
