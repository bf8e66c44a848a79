from . import brachistochrone, car_parking, cartpole

__all__ = ["brachistochrone", "car_parking", "cartpole"]
