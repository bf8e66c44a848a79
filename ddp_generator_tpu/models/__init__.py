from . import brachistochrone, car_parking

__all__ = ["brachistochrone", "car_parking"]
