package graft.ros

/** Well-known ROS message definitions (public ROS wiki) used by the
  * demo pipeline and the test suite — the fixture technique of
  * reference rosbag2parquet_test.cpp:40-57.
  */
object Fixtures {
  /** sensor_msgs/Imu with full dependency closure, as carried in bag
    * connection records (the reference's end-to-end fixture type,
    * rosbag2parquet_test.cpp:166-197).
    */
  val imuDef: String =
    """# This is a message to hold data from an IMU (Inertial Measurement Unit)
      |Header header
      |geometry_msgs/Quaternion orientation
      |float64[9] orientation_covariance # Row major about x, y, z axes
      |geometry_msgs/Vector3 angular_velocity
      |float64[9] angular_velocity_covariance
      |geometry_msgs/Vector3 linear_acceleration
      |float64[9] linear_acceleration_covariance
      |================================================================================
      |MSG: std_msgs/Header
      |uint32 seq
      |time stamp
      |string frame_id
      |================================================================================
      |MSG: geometry_msgs/Quaternion
      |float64 x
      |float64 y
      |float64 z
      |float64 w
      |================================================================================
      |MSG: geometry_msgs/Vector3
      |float64 x
      |float64 y
      |float64 z
      |""".stripMargin

  val imuMd5 = "6a62c6daae103f4ff57a132d6f95cec2"

  /** rosgraph_msgs/Log — constants + string + array fields
    * (reference README.md:44-67 shows its converted schema).
    */
  val logDef: String =
    """##
      |## Severity level constants
      |byte DEBUG=1 #debug level
      |byte INFO=2  #general level
      |byte WARN=4  #warning level
      |byte ERROR=8 #error level
      |byte FATAL=16 #fatal/critical level
      |Header header
      |byte level
      |string name # name of the node
      |string msg # message
      |string file # file the message came from
      |string function # function the message came from
      |uint32 line # line the message came from
      |string[] topics # topic names that the node publishes
      |================================================================================
      |MSG: std_msgs/Header
      |uint32 seq
      |time stamp
      |string frame_id
      |""".stripMargin
}
