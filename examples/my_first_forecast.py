"""My first forecast — the pySPEEDY introductory workflow
(reference: examples/My_first_forecast.ipynb), adapted to pySPEEDY-TPU.

Runs a two-month T30L8 forecast from the bundled ERA-derived climatological
boundary conditions, checkpoints monthly means after a spinup period, and
exports NetCDF snapshots.
"""

from datetime import datetime

from pyspeedy_tpu import Speedy
from pyspeedy_tpu.callbacks import ModelCheckpoint, XarrayExporter

start_date = datetime(1980, 1, 1)
end_date = datetime(1980, 2, 29)
spinup_date = datetime(1980, 2, 1)

model = Speedy(start_date=start_date, end_date=end_date)

# Initialize the model state from the default boundary conditions
# (orography, land-sea mask, albedo, monthly climatologies of land/sea
# surface conditions). See Speedy.set_bc for the NetCDF contract.
model.set_bc()

model_checkpoints = ModelCheckpoint(
    interval=36,            # once per simulated day
    spinup_date=spinup_date,
    variables=("u_grid", "v_grid", "t_grid", "ps_grid"),
)
exporter = XarrayExporter(
    interval=36, spinup_date=spinup_date, output_dir="./output",
)

model.run(callbacks=[model_checkpoints, exporter])

ds = model_checkpoints.dataframe
print(ds)

# Surface (lowest-level) temperature of the final state:
t_sfc = model["t_grid"][:, :, -1]
print("surface T range [K]:", t_sfc.min(), t_sfc.max())
